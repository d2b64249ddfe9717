"""Iceberg partition transforms (spec § Partition Transforms, Appendix B).

The reference delegates partition layout entirely to pyiceberg/engine
writers (it only ever READS partition tuples, formatters.py's partition
rollups); this module implements the transform algebra itself so the
native write path can LAY OUT data the way real 100-TB tables are laid
out — ``bucket[N]`` for join co-location, ``year/month/day/hour`` for
time-range pruning, ``truncate[W]`` for prefix grouping — and so the scan
planner can PROJECT a source-column predicate onto the stored partition
values (spec: "transforms must be order-preserving or support projection
for pruning").

Three faces per transform, used by three consumers:

- :func:`spark_expr` — a Spark Column computing the partition value at
  WRITE time (``write_dataframe_files`` partitions the output by it).
  JVM-side column arithmetic wherever possible; ``bucket`` needs
  murmur3_x86_32 with seed 0 and Iceberg's byte serialization, which no
  Spark builtin provides (``F.hash`` is murmur3 seed 42 over Spark's own
  layout), so it is an Arrow-batched pandas UDF — numpy-vectorized for
  the fixed 8-byte numeric encoding, per-row only for variable-length
  strings.
- :func:`apply_value` — the same transform on one Python scalar (plan-time
  predicate projection, tests).
- :func:`project_range` — maps a source-column ``[lo, hi]`` interval to a
  partition-value interval, or ``None`` when the transform cannot prune
  that shape (``bucket`` projects equality only: hashing destroys order).

Hash pins: murmur3_x86_32 reference vectors and the spec Appendix B
bucket hash examples (int 34, long 34, string "iceberg", date
2017-11-16) are unit-tested in tests/test_iceberg_transforms.py.
"""

from __future__ import annotations

import datetime
import re
import struct

import pandas as pd  # module-level: pandas_udf type hints resolve 'pd'

_EPOCH = datetime.date(1970, 1, 1)
_MASK32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit murmur3 (x86 variant), unsigned result in [0, 2^32)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4:i * 4 + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    tail = data[nblocks * 4:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


def iceberg_hash_long(v: int) -> int:
    """Spec Appendix B: int/long/date/time/timestamp all hash as the
    value widened to a LONG, serialized 8-byte little-endian, SIGNED
    32-bit result (Java int semantics)."""
    h = murmur3_x86_32(struct.pack("<q", v))
    return h - (1 << 32) if h >= (1 << 31) else h


def iceberg_hash_string(s: str) -> int:
    """Spec Appendix B: string hashes as its UTF-8 bytes, signed result."""
    h = murmur3_x86_32(s.encode("utf-8"))
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_value(v, src_type: str, n: int) -> int | None:
    """``bucket[n]`` of one scalar: (hash & Integer.MAX_VALUE) % n."""
    if v is None:
        return None
    t = src_type.lower()
    if t in ("int", "long"):
        h = iceberg_hash_long(int(v))
    elif t == "date":
        d = v if isinstance(v, int) else (v - _EPOCH).days
        h = iceberg_hash_long(int(d))
    elif t == "string":
        h = iceberg_hash_string(v)
    else:
        raise ValueError(f"bucket transform unsupported for type {src_type!r}")
    return (h & 0x7FFFFFFF) % n


def _mm3_long_numpy(vals):
    """Vectorized murmur3_x86_32 over int64 values serialized as 8-byte
    little-endian (the fixed-width case: exactly two 4-byte blocks), the
    hot path for bucket[int/long/date] writes — one numpy pass per Arrow
    batch, no per-row Python. Returns SIGNED int32 hashes (numpy int64
    dtype). Equality with the scalar form is property-tested."""
    import numpy as np

    u = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)
    m = np.uint64(_MASK32)
    k1 = u & m
    k2 = (u >> np.uint64(32)) & m
    h = np.zeros(len(u), dtype=np.uint64)
    for k in (k1, k2):
        k = (k * np.uint64(0xCC9E2D51)) & m
        k = (((k << np.uint64(15)) | (k >> np.uint64(17)))) & m
        k = (k * np.uint64(0x1B873593)) & m
        h ^= k
        h = (((h << np.uint64(13)) | (h >> np.uint64(19)))) & m
        h = (h * np.uint64(5) + np.uint64(0xE6546B64)) & m
    h ^= np.uint64(8)
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & m
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & m
    h ^= h >> np.uint64(16)
    out = h.astype(np.int64)
    return out - ((out >> 31) & 1) * (1 << 32)


def parse_transform(t: str) -> tuple[str, int | None]:
    """'bucket[4]' -> ('bucket', 4); 'day' -> ('day', None)."""
    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", t)
    if m:
        width = int(m.group(2))
        if width < 1:
            raise ValueError(f"{m.group(1)} width must be >= 1, got {t!r}")
        return m.group(1), width
    if t in ("identity", "year", "month", "day", "hour", "void"):
        return t, None
    raise ValueError(f"unknown partition transform {t!r}")


def result_avro_type(transform: str, src_type: str) -> str:
    """Avro primitive for the partition-record field this transform
    produces (manifest entry encode/decode is schema-driven). Raises a
    GUIDED error for unsupported (transform, type) pairs so DDL fails at
    definition time, not at first commit."""
    kind, _ = parse_transform(transform)
    if kind == "identity":
        from iceberg_meta_spark.sources.iceberg_write import _AVRO_T

        if src_type not in _AVRO_T:
            hint = (" — partition by day(col) instead (same granularity, "
                    "prunable)") if src_type == "date" else ""
            raise ValueError(
                f"identity partitioning unsupported for type {src_type!r}{hint}"
            )
        return _AVRO_T[src_type]
    if kind == "truncate":
        if src_type not in ("int", "long", "string"):
            raise ValueError(f"truncate unsupported for type {src_type!r}")
        return {"int": "int", "long": "long", "string": "string"}[src_type]
    if kind == "bucket" and src_type not in ("int", "long", "date", "string"):
        raise ValueError(f"bucket unsupported for type {src_type!r}")
    if kind in ("year", "month", "day") and src_type not in ("date", "timestamp"):
        raise ValueError(f"{kind} transform needs a date/timestamp column, "
                         f"got {src_type!r}")
    if kind == "hour" and src_type != "timestamp":
        raise ValueError(f"hour transform needs a timestamp column, "
                         f"got {src_type!r}")
    # bucket / year / month / day / hour / void -> int per spec
    return "int"


def spark_expr(transform: str, col: str, src_type: str):
    """Spark Column computing this transform of ``col`` at write time."""
    from pyspark.sql import functions as F

    kind, param = parse_transform(transform)
    t = src_type.lower()
    if kind == "identity":
        return F.col(col)
    if kind == "void":
        return F.lit(None).cast("int")
    if kind == "truncate":
        if t in ("int", "long"):
            # floor-to-multiple, correct for negatives: v - pmod(v, W)
            return (F.col(col) - F.pmod(F.col(col), F.lit(param))).cast(t)
        if t == "string":
            return F.substring(F.col(col), 1, param)
        raise ValueError(f"truncate unsupported for type {src_type!r}")
    if kind in ("year", "month", "day", "hour") and t == "timestamp":
        # TIMESTAMP sources: compute from the instant's epoch value, never
        # from calendar extraction — F.year/F.month/F.datediff on a
        # timestamp render in the SESSION timezone, so under a non-UTC
        # session the written partition values would diverge from
        # apply_value's UTC projection and pruning could drop matching
        # rows. cast("double") yields fractional epoch seconds
        # (tz-independent); floor division is exact for pre-1970 too.
        epoch_days = F.floor(F.col(col).cast("double") / 86400).cast("int")
        if kind == "hour":
            return F.floor(F.col(col).cast("double") / 3600).cast("int")
        if kind == "day":
            return epoch_days
        # year/month need UTC calendar fields: route through DateType
        # (tz-free) built from the epoch-day number
        d = F.date_add(F.to_date(F.lit("1970-01-01")), epoch_days)
        if kind == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        return ((F.year(d) - F.lit(1970)) * 12 + F.month(d) - 1).cast("int")
    if kind == "year":
        return (F.year(col) - F.lit(1970)).cast("int")
    if kind == "month":
        return ((F.year(col) - F.lit(1970)) * 12 + F.month(col) - 1).cast("int")
    if kind == "day":
        # DATE sources only (timestamps handled above): DateType calendar
        # arithmetic is timezone-free
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("int")
    if kind == "hour":
        raise ValueError(f"hour transform needs a timestamp column, got {src_type!r}")
    if kind == "bucket":
        n = param
        if t in ("int", "long", "date"):
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("int")
            def _bucket_long(s: pd.Series) -> pd.Series:
                vals = s
                if t == "date":
                    vals = (
                        pd.to_datetime(vals) - pd.Timestamp("1970-01-01")
                    ).dt.days
                h = _mm3_long_numpy(vals.astype("int64").to_numpy())
                return pd.Series(
                    [(int(x) & 0x7FFFFFFF) % n for x in h]
                ).astype("Int32")

            # null-safety OUTSIDE the UDF: coalescing the input keeps the
            # Arrow batch int64-exact (a null in a long batch would arrive
            # as float64 and round ids past 2^53 before hashing); the
            # outer when() restores null partition values for null keys
            zero = (F.to_date(F.lit("1970-01-01")) if t == "date"
                    else F.lit(0).cast(t))
            return F.when(
                F.col(col).isNull(), F.lit(None).cast("int")
            ).otherwise(_bucket_long(F.coalesce(F.col(col), zero)))
        if t == "string":
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("int")
            def _bucket_str(s: pd.Series) -> pd.Series:
                # variable-length input: per-row mm3 inside the Arrow batch
                return s.map(
                    lambda v: None if v is None
                    else (iceberg_hash_string(v) & 0x7FFFFFFF) % n
                ).astype("Int32")

            return _bucket_str(F.col(col))
        raise ValueError(f"bucket unsupported for type {src_type!r}")
    raise ValueError(f"unknown transform {transform!r}")


def apply_value(transform: str, v, src_type: str):
    """The same transform on one Python scalar (plan-time projection)."""
    kind, param = parse_transform(transform)
    if v is None:
        return None
    t = src_type.lower()
    if kind == "identity":
        return v
    if kind == "void":
        return None
    if kind == "truncate":
        if t in ("int", "long"):
            return int(v) - (int(v) % param)  # python % is floor-mod
        if t == "string":
            return v[:param]
        raise ValueError(f"truncate unsupported for type {src_type!r}")
    if kind in ("year", "month", "day"):
        if isinstance(v, datetime.datetime):
            # tz-aware datetimes project through their UTC instant (naive
            # ones are treated AS UTC), matching spark_expr's epoch math
            d = (v.astimezone(datetime.timezone.utc) if v.tzinfo else v).date()
        else:
            d = v
        if not isinstance(d, datetime.date):
            raise ValueError(f"{kind} transform needs a date, got {type(v)}")
        if kind == "year":
            return d.year - 1970
        if kind == "month":
            return (d.year - 1970) * 12 + d.month - 1
        return (d - _EPOCH).days
    if kind == "hour":
        if not isinstance(v, datetime.datetime):
            raise ValueError(f"hour transform needs a datetime, got {type(v)}")
        ts = v if v.tzinfo else v.replace(tzinfo=datetime.timezone.utc)
        return int(ts.timestamp() // 3600)
    if kind == "bucket":
        return bucket_value(v, src_type, param)
    raise ValueError(f"unknown transform {transform!r}")


def project_range(transform: str, lo, hi, src_type: str):
    """Project a source-column closed interval ``[lo, hi]`` (either end
    may be None = open) onto the partition values this transform stores.

    Returns ``(plo, phi)`` — a conservative partition-value interval every
    matching row's partition value falls in — or ``None`` when this
    transform cannot prune the predicate shape (bucket with a non-point
    interval: hashing destroys order, every bucket may match).

    Monotonic transforms (identity, truncate, year/month/day/hour) map
    endpoint-wise: transform(lo) <= transform(v) <= transform(hi) for all
    v in [lo, hi] because each is non-decreasing in v. ``truncate`` floors
    (transform(lo) <= lo), so the projected interval still covers the
    boundary partitions. ``bucket`` projects only lo == hi (point lookup).
    """
    kind, _ = parse_transform(transform)
    if kind == "void":
        return None
    if kind == "bucket":
        if lo is None or hi is None or lo != hi:
            return None
        b = apply_value(transform, lo, src_type)
        return (b, b)
    plo = apply_value(transform, lo, src_type) if lo is not None else None
    phi = apply_value(transform, hi, src_type) if hi is not None else None
    return (plo, phi)
