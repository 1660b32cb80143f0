"""Dataclass → JSON-Schema reflection (gear5_spark/spec.py).

Mirrors the reference generator's test strategy
(``jsonschema/generator/doc_test.go`` — happy-path shapes,
``errorcases_test.go`` — loud failures on unsupported types): builtin
mapping, nested $defs with $ref, cycles, optionality, containers,
Literal enums, annotation metadata, and the real config surfaces
(PipelineConfig, RestStream).
"""

from __future__ import annotations

import dataclasses
import typing

import pytest

from gear5_spark.spec import SpecError, reflect


@dataclasses.dataclass
class Inner:
    """Inner doc."""

    x: int
    tag: str = "t"


@dataclasses.dataclass
class Outer:
    name: str
    inner: Inner
    maybe: Inner | None = None
    nums: list[float] = dataclasses.field(default_factory=list)
    labels: dict[str, int] = dataclasses.field(default_factory=dict)
    kind: typing.Literal["a", "b"] = "a"
    note: str = dataclasses.field(
        default="", metadata={"jsonschema": {"description": "free text"}}
    )


def test_builtin_mapping_and_required():
    s = reflect(Inner)
    assert s["$schema"].endswith("2020-12/schema")
    assert s["properties"]["x"] == {"type": "integer"}
    assert s["properties"]["tag"] == {"type": "string", "default": "t"}
    assert s["required"] == ["x"]
    assert s["additionalProperties"] is False
    assert s["description"] == "Inner doc."


def test_nested_defs_ref_optional_containers_enum_metadata():
    s = reflect(Outer)
    p = s["properties"]
    assert p["inner"] == {"$ref": "#/$defs/Inner"}
    assert s["$defs"]["Inner"]["properties"]["x"] == {"type": "integer"}
    # optional ref -> anyOf [$ref, null]
    assert p["maybe"]["anyOf"] == [
        {"$ref": "#/$defs/Inner"},
        {"type": "null"},
    ]
    assert p["nums"] == {
        "type": "array", "items": {"type": "number"}, "default": [],
    }
    assert p["labels"] == {
        "type": "object",
        "additionalProperties": {"type": "integer"},
        "default": {},
    }
    assert p["kind"]["enum"] == ["a", "b"] and p["kind"]["type"] == "string"
    # field(metadata={"jsonschema": ...}) == @jsonSchema annotation
    assert p["note"]["description"] == "free text"
    assert s["required"] == ["name", "inner"]


def test_self_referential_cycle_resolves_to_ref():
    @dataclasses.dataclass
    class Node:
        value: int
        next: "Node | None" = None

    # a local class's string annotations resolve in this test's frame
    Node.__module__ = __name__
    globals()["Node"] = Node
    try:
        s = reflect(Node)
        assert s["properties"]["next"]["anyOf"][0] == {"$ref": "#/$defs/Node"}
        assert "Node" in s["$defs"]
    finally:
        del globals()["Node"]


def test_unsupported_types_raise_with_path():
    @dataclasses.dataclass
    class Bad:
        f: typing.Callable[[], int] = print

    with pytest.raises(SpecError, match="Bad.f"):
        reflect(Bad)

    @dataclasses.dataclass
    class BadKeys:
        m: dict[int, str] = dataclasses.field(default_factory=dict)

    with pytest.raises(SpecError, match="keys must be str"):
        reflect(BadKeys)

    with pytest.raises(SpecError, match="needs a dataclass"):
        reflect(int)


def test_def_name_collision_raises():
    """Two DISTINCT nested dataclasses sharing a bare class name must
    not silently collapse into one $defs entry — fail loudly."""

    def _mk_auth(field_name):
        cls = dataclasses.make_dataclass("Auth", [(field_name, int)])
        cls.__module__ = f"fake_mod_{field_name}"
        return cls

    auth_a, auth_b = _mk_auth("token"), _mk_auth("key")

    @dataclasses.dataclass
    class Outer:
        a: auth_a  # type: ignore[valid-type]
        b: auth_b  # type: ignore[valid-type]

    # bypass get_type_hints string resolution: inject real classes
    Outer.__annotations__ = {"a": auth_a, "b": auth_b}
    with pytest.raises(SpecError, match="collision"):
        reflect(Outer)


def test_pipeline_config_spec_shape():
    from gear5_spark.config import PipelineConfig, config_spec

    s = config_spec()
    p = s["properties"]
    assert set(p) == {f.name for f in dataclasses.fields(PipelineConfig)}
    assert s["required"] == ["changelog_dir", "table_dir", "checkpoint_dir"]
    assert p["mode"]["enum"] == ["stream", "bulk"]
    assert p["sink_mode"]["enum"] == ["cow", "mor", None]
    assert p["sink_mode"]["type"] == ["string", "null"]
    assert p["exclude_columns"] == {
        "type": "array", "items": {"type": "string"}, "default": [],
    }
    # every default in the schema round-trips the dataclass default
    cfg = PipelineConfig(changelog_dir="a", table_dir="b", checkpoint_dir="c")
    for name, entry in p.items():
        if "default" in entry:
            assert entry["default"] == getattr(cfg, name), name


def test_rest_stream_reflects():
    from gear5_spark.sources.rest import RestStream

    s = reflect(RestStream)
    p = s["properties"]
    assert p["page_size"] == {"type": "integer", "default": 100}
    assert p["max_records"]["type"] == ["integer", "null"]
    assert p["stats"]["additionalProperties"] == {"type": "integer"}
    assert s["required"] == ["namespace", "name"]


def test_cli_airbyte_wrap(capsys):
    import json

    from gear5_spark.cli import main

    rc = main(["spec", "--airbyte"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert "connectionSpecification" in out["spec"]
    assert (
        "changelog_dir"
        in out["spec"]["connectionSpecification"]["properties"]
    )
