"""Dataclass → JSON-Schema reflection (the ``spec`` surface).

Re-expresses the reference's build-time schema generator
(``jsonschema/generator/generator.go`` — walks Go struct types with
``golang.org/x/tools/go/loader``, auto-creates ``$defs`` for nested
structs, maps builtins via ``type_helper.go:15-33``, honors
``@jsonSchema`` annotations via ``schema_attrs.go``) as runtime
reflection over Python dataclasses: no AST loader is needed because
dataclasses carry their field types at runtime.

Semantics kept from the generator:

- builtin mapping (``type_helper.go``): str→string, bool→boolean,
  int→integer, float→number, bytes→string, datetime→string
  (``format: date-time``), date→string (``format: date``);
- nested dataclasses auto-create ``$defs`` entries referenced by
  ``$ref`` (the ``AutoCreateDefs`` option's default behavior), with
  cycle-safe resolution (``globalDefCache`` ≈ the memo here);
- optionality: ``X | None`` renders scalars as ``"type": [t, "null"]``
  and refs as ``anyOf: [$ref, {"type": "null"}]``;
- containers: ``list[T]``/``tuple[T, ...]`` → array+items,
  ``dict[str, T]`` → object+additionalProperties;
- ``Literal[...]`` → ``enum`` (the annotation-driven enum attr);
- per-field attributes ride ``field(metadata={"jsonschema": {...}})``
  (≈ ``@jsonSchema`` annotations: description, title, examples,
  minimum/maximum, pattern, format, ...);
- fields with defaults surface ``default`` and are not ``required``;
- unsupported types raise ``SpecError`` with the offending path
  (``errorcases_test.go`` parity: fail loudly, never emit a schema
  that silently drops a field).
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import types as _types
import typing as _t

_SCALARS: dict[type, dict] = {
    str: {"type": "string"},
    bool: {"type": "boolean"},
    int: {"type": "integer"},
    float: {"type": "number"},
    bytes: {"type": "string"},
    _dt.datetime: {"type": "string", "format": "date-time"},
    _dt.date: {"type": "string", "format": "date"},
}


class SpecError(TypeError):
    """A config type the spec generator cannot express (parity with the
    generator's error cases — never silently drop or guess)."""


def _is_dataclass_type(tp) -> bool:
    return isinstance(tp, type) and dataclasses.is_dataclass(tp)


def _doc_description(cls) -> str | None:
    doc = (cls.__doc__ or "").strip()
    if not doc:
        return None
    # first paragraph only — the rest is implementation commentary
    return " ".join(doc.split("\n\n")[0].split())


def _json_default(v):
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if isinstance(v, (list, tuple)):
        return [_json_default(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_default(x) for k, x in v.items()}
    return str(v)


class _Reflector:
    def __init__(self) -> None:
        self.defs: dict[str, dict] = {}
        self._in_progress: set[str] = set()
        self._def_owner: dict[str, type] = {}

    def schema_for(self, tp, path: str) -> dict:
        origin = _t.get_origin(tp)
        if tp in _SCALARS:
            return dict(_SCALARS[tp])
        if tp is _t.Any:
            return {}  # any-typed: unconstrained schema
        if tp is type(None):
            return {"type": "null"}
        if origin in (_t.Union, _types.UnionType):
            return self._union(_t.get_args(tp), path)
        if origin is _t.Literal:
            vals = list(_t.get_args(tp))
            out: dict = {"enum": vals}
            kinds = {type(v) for v in vals}
            if len(kinds) == 1 and next(iter(kinds)) in _SCALARS:
                out["type"] = _SCALARS[next(iter(kinds))]["type"]
            return out
        if origin in (list, tuple) or tp in (list, tuple):
            args = [a for a in _t.get_args(tp) if a is not Ellipsis]
            out = {"type": "array"}
            if args:
                out["items"] = self.schema_for(args[0], f"{path}[]")
            return out
        if origin is dict or tp is dict:
            args = _t.get_args(tp)
            if args and args[0] is not str:
                raise SpecError(
                    f"{path}: JSON object keys must be str, got "
                    f"{args[0]!r}"
                )
            out = {"type": "object"}
            if args:
                out["additionalProperties"] = self.schema_for(
                    args[1], f"{path}{{}}"
                )
            return out
        if _is_dataclass_type(tp):
            return self._ref(tp, path)
        raise SpecError(f"{path}: unsupported config type {tp!r}")

    def _union(self, args, path: str) -> dict:
        args = list(args)
        if type(None) in args and len(args) == 2:
            inner = self.schema_for(
                next(a for a in args if a is not type(None)), path
            )
            if set(inner) == {"type"} and isinstance(inner["type"], str):
                return {"type": [inner["type"], "null"]}
            return {"anyOf": [inner, {"type": "null"}]}
        return {"anyOf": [self.schema_for(a, path) for a in args]}

    def _ref(self, cls, path: str) -> dict:
        name = cls.__name__
        owner = self._def_owner.get(name)
        if owner is not None and owner is not cls:
            # two distinct classes sharing a bare name would silently
            # collapse into one $defs entry — the module contract is
            # fail loudly, never emit a schema that drops a field
            raise SpecError(
                f"{path}: $defs name collision — {name!r} is claimed by "
                f"both {owner.__module__}.{owner.__qualname__} and "
                f"{cls.__module__}.{cls.__qualname__}"
            )
        if name not in self.defs and name not in self._in_progress:
            # reserve BEFORE recursing: a self-referential dataclass
            # resolves to the same $ref instead of recursing forever
            self._def_owner[name] = cls
            self._in_progress.add(name)
            self.defs[name] = self.object_schema(cls)
            self._in_progress.discard(name)
        return {"$ref": f"#/$defs/{name}"}

    def object_schema(self, cls) -> dict:
        try:
            hints = _t.get_type_hints(cls)
        except Exception as e:  # unresolvable forward ref
            raise SpecError(f"{cls.__name__}: cannot resolve types: {e}")
        props: dict[str, dict] = {}
        required: list[str] = []
        for f in dataclasses.fields(cls):
            if f.name.startswith("_") or not f.init:
                continue  # runtime-internal state, not config surface
            entry = self.schema_for(hints[f.name], f"{cls.__name__}.{f.name}")
            if f.default is not dataclasses.MISSING:
                entry["default"] = _json_default(f.default)
            elif f.default_factory is not dataclasses.MISSING:
                entry["default"] = _json_default(f.default_factory())
            else:
                required.append(f.name)
            extra = f.metadata.get("jsonschema") if f.metadata else None
            if extra:
                entry.update(extra)  # @jsonSchema annotation parity
            props[f.name] = entry
        out: dict = {"type": "object", "properties": props}
        desc = _doc_description(cls)
        if desc:
            out["description"] = desc
        if required:
            out["required"] = required
        out["additionalProperties"] = False
        return out


def reflect(cls, title: str | None = None) -> dict:
    """JSON Schema (draft 2020-12) for a dataclass config type — the
    ``jsonschema.Reflect(config)`` call of the reference's spec command
    (``protocol/spec.go:33-36``). Root object inline; nested dataclass
    types land in ``$defs``."""
    if not _is_dataclass_type(cls):
        raise SpecError(f"reflect() needs a dataclass, got {cls!r}")
    r = _Reflector()
    root = r.object_schema(cls)
    out = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": title or cls.__name__,
        **root,
    }
    if r.defs:
        out["$defs"] = r.defs
    return out
