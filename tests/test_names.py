"""F9 name sanitization — parity with the reference's SafeNameConversion
(/root/reference/drivers/google-sheets/internal/utils.go:147-185)."""

from __future__ import annotations

from gear5_spark.operators.names import sanitize_name, sanitize_unique


def test_reference_documented_example():
    # the example in the reference's own comment (utils.go:155)
    assert sanitize_name("1MyName") == "_1_my_name"


def test_camel_and_snake():
    assert sanitize_name("UserAgent") == "user_agent"
    assert sanitize_name("foo_bar") == "foo_bar"
    assert sanitize_name("someXMLValue") == "some_xmlvalue"


def test_unicode_transliteration():
    assert sanitize_name("größe") == "grosse"
    assert sanitize_name("ümlaut") == "umlaut"
    assert sanitize_name("café au lait") == "cafe_au_lait"


def test_digit_and_symbol_edges():
    assert sanitize_name("123") == "_123"
    assert sanitize_name("  spaced key ") == "_spaced_key_"
    assert sanitize_name("_x") == "_x"
    assert sanitize_name("x_") == "x_"


def test_collision_dedup_is_deterministic():
    m = sanitize_unique(["a-b", "a_b", "A B"])
    assert m == {"A B": "a_b", "a-b": "a_b_2", "a_b": "a_b_3"}
    # keys sanitize independently of call order (sorted internally)
    m2 = sanitize_unique(["a_b", "A B", "a-b"])
    assert m == m2
