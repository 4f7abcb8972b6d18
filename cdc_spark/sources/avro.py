"""Avro change-feed decoding (reference T6: GoldenGate Avro-on-Kafka).

The reference consumes Avro-encoded GoldenGate records and keeps a
schema cache keyed by the writer schema's 64-bit fingerprint
(source/oracle/Normalizer.java:97-117, common/AvroConverter.java:105-236
— our decoder deliberately does NOT replicate convertAvroMap's
empty-return bug noted in SURVEY §2 T6). Two decode paths here:

- **JVM path** (`decode_avro_changes(..., impl="jvm")`): thin wrapper
  over `pyspark.sql.avro.functions.from_avro` — the fast path on a real
  cluster where the `spark-avro` package is loaded
  (`--packages org.apache.spark:spark-avro_2.13:<ver>`). Fixed writer
  schema per stream (the common deployment).
- **Python path** (`impl="python"`): a pure-Python Avro *binary* decoder
  (Avro spec encodings: zigzag varints, length-prefixed strings/bytes,
  block-encoded arrays/maps, union indexes) run as an Arrow-batched
  ``mapInPandas`` kernel — one Python invocation per Arrow batch, never
  per Spark row. Supports Avro single-object encoding (``C3 01`` marker
  + little-endian CRC-64-AVRO schema fingerprint) with a multi-version
  writer-schema cache, i.e. the reference's fingerprint cache including
  mid-stream writer-schema changes. The sandbox has no spark-avro jar,
  so this path is the tested one; `impl="auto"` probes for the jar.

Everything implements the public Apache Avro specification (binary
encoding, single-object encoding, CRC-64-AVRO, Parsing Canonical Form).
"""

from __future__ import annotations

import io
import json
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_spark.schema import CHANGE_SCHEMA

# ---------------------------------------------------------------------------
# Avro schema for the canonical change event (mirrors CHANGE_SCHEMA)
# ---------------------------------------------------------------------------

_PAYLOAD_AVRO = {
    "type": "record",
    "name": "Payload",
    "fields": [
        {"name": "doc_id", "type": ["null", "string"]},
        {"name": "tokens", "type": ["null", {"type": "array", "items": "int"}]},
        {"name": "n_tok", "type": ["null", "int"]},
        {"name": "source", "type": ["null", "string"]},
        {"name": "extra", "type": ["null", {"type": "map", "values": "string"}]},
    ],
}

#: Canonical writer schema for CHANGE_SCHEMA events on the wire.
CHANGE_AVRO_SCHEMA = {
    "type": "record",
    "name": "ChangeEvent",
    "fields": [
        {"name": "lsn", "type": "long"},
        {"name": "epoch", "type": "int"},
        {"name": "table", "type": ["null", "string"]},
        {"name": "op_type", "type": ["null", "string"]},
        {"name": "primary_keys", "type": ["null", {"type": "array", "items": "string"}]},
        {"name": "doc_id", "type": ["null", "string"]},
        {"name": "before", "type": ["null", _PAYLOAD_AVRO]},
        {"name": "after", "type": ["null", "Payload"]},
        {"name": "missing_mask", "type": ["null", {"type": "array", "items": "string"}]},
        {"name": "ddl_kind", "type": ["null", "string"]},
        {"name": "ddl_payload", "type": ["null", "string"]},
    ],
}

# ---------------------------------------------------------------------------
# Parsing Canonical Form + CRC-64-AVRO fingerprint (Avro spec)
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def canonical_form(schema, named: dict | None = None) -> str:
    """Avro Parsing Canonical Form (subset: primitives, records, enums,
    arrays, maps, unions, fixed) — attribute order normalized, defaults/
    docs/aliases stripped, minimal JSON. Named-type re-references render
    as their fullname."""
    named = {} if named is None else named
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return f'"{schema}"'
        return f'"{named[schema]}"'  # reference to an already-defined name
    if isinstance(schema, list):
        return "[" + ",".join(canonical_form(s, named) for s in schema) + "]"
    t = schema["type"]
    if t in _PRIMITIVES and len(schema) == 1:
        return f'"{t}"'
    if t == "array":
        return '{"type":"array","items":%s}' % canonical_form(schema["items"], named)
    if t == "map":
        return '{"type":"map","values":%s}' % canonical_form(schema["values"], named)
    if t == "record":
        name = schema["name"]
        named[name] = name
        fields = ",".join(
            '{"name":%s,"type":%s}' % (json.dumps(f["name"]), canonical_form(f["type"], named))
            for f in schema["fields"]
        )
        return '{"name":%s,"type":"record","fields":[%s]}' % (json.dumps(name), fields)
    if t == "enum":
        return '{"name":%s,"type":"enum","symbols":%s}' % (
            json.dumps(schema["name"]), json.dumps(schema["symbols"], separators=(",", ":")))
    if t == "fixed":
        return '{"name":%s,"type":"fixed","size":%d}' % (
            json.dumps(schema["name"]), schema["size"])
    raise ValueError(f"unsupported schema for canonical form: {t}")


_EMPTY64 = 0xC15D213AA4D7A795
_MASK64 = (1 << 64) - 1
_FP_TABLE: list[int] | None = None


def fingerprint64(data: bytes) -> int:
    """CRC-64-AVRO over raw bytes (Avro spec pseudo-code, 64-bit masked)."""
    global _FP_TABLE
    if _FP_TABLE is None:
        _FP_TABLE = []
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_EMPTY64 & (_MASK64 if fp & 1 else 0))
            _FP_TABLE.append(fp)
    fp = _EMPTY64
    for b in data:
        fp = (fp >> 8) ^ _FP_TABLE[(fp ^ b) & 0xFF]
    return fp


def schema_fingerprint(schema) -> int:
    return fingerprint64(canonical_form(schema).encode("utf-8"))


# ---------------------------------------------------------------------------
# Binary codec (Avro spec encodings)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        b = buf.read(1)[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _collect_named(schema, named: dict) -> None:
    """Pre-register record/enum/fixed definitions so later by-name
    references ("Payload") resolve even when the defining branch of a
    union was null for every row seen so far."""
    if isinstance(schema, list):
        for s in schema:
            _collect_named(s, named)
    elif isinstance(schema, dict):
        t = schema["type"]
        if t in ("record", "enum", "fixed"):
            named[schema["name"]] = schema
        if t == "record":
            for f in schema["fields"]:
                _collect_named(f["type"], named)
        elif t == "array":
            _collect_named(schema["items"], named)
        elif t == "map":
            _collect_named(schema["values"], named)


def _encode(schema, value, out: bytearray, named: dict) -> None:
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        else:
            return _encode(named[schema], value, out, named)
    elif isinstance(schema, list):  # union: [null, X] — index then value
        if value is None:
            idx = next(i for i, s in enumerate(schema) if s == "null")
            out += _zigzag_encode(idx)
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        out += _zigzag_encode(idx)
        return _encode(schema[idx], value, out, named)
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "string":
        raw = value.encode("utf-8")
        out += _zigzag_encode(len(raw))
        out += raw
    elif t == "bytes":
        out += _zigzag_encode(len(value))
        out += bytes(value)
    elif t == "array":
        if value:
            out += _zigzag_encode(len(value))
            for v in value:
                _encode(schema["items"], v, out, named)
        out += _zigzag_encode(0)
    elif t == "map":
        if value:
            out += _zigzag_encode(len(value))
            for k, v in value.items():
                _encode("string", k, out, named)
                _encode(schema["values"], v, out, named)
        out += _zigzag_encode(0)
    elif t == "record":
        named[schema["name"]] = schema
        for f in schema["fields"]:
            _encode(f["type"], None if value is None else value.get(f["name"]), out, named)
    else:
        raise ValueError(f"unsupported type {t}")


def _decode(schema, buf: io.BytesIO, named: dict):
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        else:
            return _decode(named[schema], buf, named)
    elif isinstance(schema, list):
        idx = _zigzag_decode(buf)
        return _decode(schema[idx], buf, named)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1)[0] == 1
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if t == "bytes":
        return buf.read(_zigzag_decode(buf))
    if t == "array":
        out = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (skippable form)
                _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf, named))
    if t == "map":
        out = {}
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:
                _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                k = buf.read(_zigzag_decode(buf)).decode("utf-8")
                out[k] = _decode(schema["values"], buf, named)
    if t == "record":
        named[schema["name"]] = schema
        return {f["name"]: _decode(f["type"], buf, named) for f in schema["fields"]}
    raise ValueError(f"unsupported type {t}")


# ---------------------------------------------------------------------------
# Single-object encoding + schema cache
# ---------------------------------------------------------------------------

_SO_MAGIC = b"\xc3\x01"


def encode_single_object(schema, value: dict) -> bytes:
    """Avro single-object encoding: C3 01 + 8-byte LE fingerprint + body."""
    out = bytearray(_SO_MAGIC)
    out += struct.pack("<Q", schema_fingerprint(schema))
    named: dict = {}
    _collect_named(schema, named)
    _encode(schema, value, out, named)
    return bytes(out)


class AvroSchemaCache:
    """fingerprint64 → writer schema (reference Normalizer.java:97-117).

    Pre-registered schemas only: an unknown fingerprint fails loudly —
    silently guessing a schema would corrupt every downstream row."""

    def __init__(self, schemas) -> None:
        self._by_fp = {schema_fingerprint(s): s for s in schemas}

    def get(self, fp: int):
        s = self._by_fp.get(fp)
        if s is None:
            raise ValueError(
                f"unknown Avro writer-schema fingerprint 0x{fp:016x}; register "
                "the schema with the decoder (strict, like the reference cache)"
            )
        return s

    def schemas(self) -> list:
        return list(self._by_fp.values())


def decode_single_object(data: bytes, cache: AvroSchemaCache) -> dict:
    if data[:2] != _SO_MAGIC:
        raise ValueError("not Avro single-object encoding (missing C3 01 marker)")
    fp = struct.unpack("<Q", data[2:10])[0]
    schema = cache.get(fp)
    named: dict = {}
    _collect_named(schema, named)
    return _decode(schema, io.BytesIO(data[10:]), named)


# ---------------------------------------------------------------------------
# DataFrame-level decode (the source-adapter surface)
# ---------------------------------------------------------------------------

_CHANGE_FIELDS = [f.name for f in CHANGE_SCHEMA.fields]


def decode_avro_changes(
    raw: DataFrame,
    writer_schemas: list | None = None,
    impl: str = "auto",
    framed: bool | None = None,
) -> DataFrame:
    """Kafka-shaped (value: binary) → CHANGE_SCHEMA rows.

    impl="jvm": `from_avro` (needs the spark-avro package; raw bytes,
    no single-object framing, single writer schema — the common
    fixed-schema topic). impl="python": Arrow-batched mapInPandas
    kernel decoding single-object frames against the fingerprint cache
    (handles mid-stream writer-schema versions). impl="auto" uses jvm
    when the Avro data source is loadable AND the values are unframed.

    `framed` declares whether values carry the single-object C3 01 +
    fingerprint prefix. Framing decides correctness, not just speed:
    `from_avro` on a framed value would decode the marker bytes as data
    — Avro scalar decoding rarely fails structurally, so a framed topic
    through the jvm path yields garbage rows, not an error. When left
    None, auto-probes the first value on batch input; streaming input
    assumes framed=True (the engine's own wire format — and the python
    decoder fails LOUDLY on unframed bytes, the safe direction)."""
    schemas = writer_schemas or [CHANGE_AVRO_SCHEMA]
    if framed is None and (impl in ("auto", "jvm")) and not raw.isStreaming:
        row = raw.select("value").filter(F.col("value").isNotNull()).first()
        framed = row is None or bytes(row["value"])[:2] == _SO_MAGIC
    if framed is None:
        framed = True  # streaming, unprobed: assume the engine's wire
    if impl == "auto":
        impl = "jvm" if (not framed and _jvm_avro_available(raw.sparkSession)) else "python"
    if impl == "jvm":
        if framed:
            raise ValueError(
                "values carry the Avro single-object C3 01 framing; "
                "from_avro would silently mis-decode them — use "
                "impl='python' (or framed=False for a truly unframed topic)"
            )
        from pyspark.sql.avro.functions import from_avro

        parsed = raw.select(
            from_avro("value", json.dumps(schemas[0])).alias("c")
        )
        return parsed.select("c.*")

    cache = AvroSchemaCache(schemas)

    def decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for data in pdf["value"]:
                rec = decode_single_object(bytes(data), cache)
                # writer-schema resolution: project into the reader shape
                # (fields absent from an older writer schema become null)
                rows.append({k: rec.get(k) for k in _CHANGE_FIELDS})
            yield pd.DataFrame(rows, columns=_CHANGE_FIELDS)

    return raw.select("value").mapInPandas(decode_batches, CHANGE_SCHEMA)


def _clean_value(v):
    """Arrow→pandas artifacts back to plain Python: NaN→None, numpy
    arrays→lists, map-as-tuple-list→dict, numpy scalars→int/float."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN null marker
        return None
    if isinstance(v, np.ndarray):
        return [_clean_value(x) for x in v.tolist()]
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, list):
        if v and isinstance(v[0], tuple) and len(v[0]) == 2:
            return {k: _clean_value(x) for k, x in v}
        return [_clean_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _clean_value(x) for k, x in v.items()}
    return v


def encode_avro_changes(changes: DataFrame, schema=None) -> DataFrame:
    """CHANGE_SCHEMA rows → (value: binary) single-object Avro frames,
    as an Arrow-batched mapInPandas kernel (the mirror of the python
    decode path; used to produce wire feeds for tests and the
    `avro-encode` CLI)."""
    schema = schema or CHANGE_AVRO_SCHEMA

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            frames = [
                bytearray(encode_single_object(schema, _clean_value(r)))
                for r in pdf.to_dict("records")
            ]
            yield pd.DataFrame({"value": frames})

    return changes.mapInPandas(encode_batches, "value binary")


def _jvm_avro_available(spark) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.avro.AvroDataToCatalyst  # noqa: B018
        loader = spark._sc._jvm.Thread.currentThread().getContextClassLoader()
        loader.loadClass("org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


def kafka_avro_reader(
    spark,
    bootstrap_servers: str,
    topic: str,
    writer_schemas: list | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    framed: bool = True,
) -> DataFrame:
    """readStream over a Kafka topic of Avro-encoded change events —
    `sources.kafka.kafka_reader` with Avro value decoding (reference
    GoldenGateKafka.java:112-240). `framed=True` (default — the
    engine's own wire format) pins the python/fingerprint decode path;
    pass framed=False only for a topic of raw un-prefixed Avro bodies,
    which makes the jvm from_avro path eligible."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return decode_avro_changes(reader.load(), writer_schemas, framed=framed)
