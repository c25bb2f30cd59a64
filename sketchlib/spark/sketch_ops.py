"""Generic DataFrame-level plan for any sketchlib Aggregator (HLL, CMS,
Bloom, KLL — and t-digest, though tdigest_ops has a specialized path).

Same two-phase shape as tdigest_ops (mapInPandas partials → applyInPandas
merge) — the shuffle carries one serialized sketch per (partition × key),
never raw rows.

Hashing stays JVM-side: for hash-based sketches the plan projects
``xxhash64(value)`` (whole-stage-codegen, no Python string hashing) and the
Python worker ingests int64 via ``update_hashed`` — the pre-hash is remixed
with the sketch seed so query paths agree (``query_hashed``/
``contains_hashed``).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from sketchlib.bloom import Bloom
from sketchlib.cms import CMS
from sketchlib.ddsketch import DDSketch
from sketchlib.hll import HLL
from sketchlib.kll import KLL
from sketchlib.kmv import KMV
from sketchlib.mg import MisraGries

SKETCHES = {"hll": HLL, "cms": CMS, "bloom": Bloom, "kll": KLL, "kmv": KMV,
            "mg": MisraGries, "dd": DDSketch}
_HASHED = {"hll", "cms", "bloom", "kmv"}  # ingest xxhash64 int64; kll/dd ingest doubles
_RAW = {"mg"}  # ingest the raw (string) item: the sketch must REPORT items back
#: sketches whose serialized state stays ≤ tens of KB at any cardinality —
#: their merge takes the repartition+mapInPandas accumulator path (one Python
#: call per Arrow batch).  Bloom/CMS can be MB-scale per sketch, so they keep
#: the groupBy().applyInPandas() path that materializes ONE group at a time.
_SMALL_STATE = {"hll", "kmv", "mg", "kll", "dd"}


def _norm_key(key) -> tuple:
    return key if isinstance(key, tuple) else (key,)


def sketch_partials(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    sketch: str,
    params: dict | None = None,
    params_by_key=None,
) -> DataFrame:
    """``params_by_key``: optional per-group constructor overrides — a dict
    (or ``sparkContext.broadcast`` of one, preferred when the key domain is
    large) mapping the normalized key tuple to a params patch, e.g.
    ``{("cnn.com",): {"expected_n": 48211}}``.  Lets each group's sketch be
    sized to ITS cardinality instead of the global row count — without it,
    S Bloom groups each carry m ≈ n_total·9.6 bits and the collected filter
    set is S× larger than needed (the 100-TB failure mode)."""
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(df.sparkSession)
    cls = SKETCHES[sketch]
    params = dict(params or {})
    hashed = sketch in _HASHED
    raw = sketch in _RAW
    if hashed:
        # NULL values are never ingested (SQL-aggregate semantics):
        # Spark's xxhash64(NULL) returns the SEED (42), not NULL, so an
        # unguarded projection would count every NULL as one phantom
        # item.  The mask rides as a SEPARATE boolean column rather than
        # a nullable hash column — a nullable int64 crosses Arrow→pandas
        # as float64, which silently mangles the low bits of every hash
        # in the batch.
        narrow = df.select(
            *keys,
            F.xxhash64(value_col).alias("_v"),
            F.col(value_col).isNull().alias("_vnull"),
        )
    elif raw:
        narrow = df.select(*keys, F.col(value_col).cast("string").alias("_v"))
    else:
        narrow = df.select(*keys, F.col(value_col).cast("double").alias("_v"))
    key_fields = [narrow.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [StructField("sketch", BinaryType(), True)]
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        overrides = (
            params_by_key.value
            if hasattr(params_by_key, "value")
            else (params_by_key or {})
        )
        aggs: dict[tuple, object] = {}
        for pdf in batches:
            mask = None  # True where the value is NULL (never ingested)
            if hashed:
                m = pdf["_vnull"].to_numpy(dtype=bool)
                mask = m if m.any() else None
                vals = pdf["_v"].to_numpy(dtype="int64").view(np.uint64)
            elif raw:
                vals = pdf["_v"].to_numpy(dtype=object)
                m = pd.isna(vals)
                mask = m if m.any() else None
            else:
                vals = pdf["_v"].to_numpy(dtype="float64", na_value=np.nan)
            groups = (
                pdf.groupby(keys, dropna=False, sort=False).indices.items()
                if keys
                else [((), np.arange(len(pdf)))]
            )
            for key, idx in groups:
                key = _norm_key(key)
                agg = aggs.get(key)
                if agg is None:
                    p = params if not overrides else {**params, **overrides.get(key, {})}
                    agg = aggs[key] = cls(**p)
                v = vals[idx]
                if mask is not None:
                    v = v[~mask[idx]]
                if hashed:
                    agg.update_hashed(v)
                else:
                    agg.update_batch(v)
        if aggs:
            rows = {name: [k[i] for k in aggs] for i, name in enumerate(keys)}
            rows["sketch"] = [a.serialize() for a in aggs.values()]
            yield pd.DataFrame(rows, columns=keys + ["sketch"])

    return narrow.mapInPandas(build, schema=out_schema)


def sketch_merge(
    partials: DataFrame,
    keys: list[str],
    sketch: str,
    params: dict | None = None,
) -> DataFrame:
    """Phase 2 for sibling sketches — the path depends on the sketch's
    state size:

    * ``_SMALL_STATE`` kinds (HLL/KMV/MG/KLL, ≤ tens of KB each) take
      tdigest_merge's repartition+mapInPandas accumulator: ONE Python call
      per Arrow batch instead of one per GROUP.  At rollup/cube key
      cardinalities (thousands of (key × hour) groups of a handful of
      partials each) the per-group ``applyInPandas`` overhead dominates the
      actual merging by an order of magnitude.
    * Bloom/CMS keep ``groupBy().applyInPandas`` (one group materialized at
      a time): a dense Bloom bitmap is MBs, so holding every co-located
      key's sketch in one partition dict would blow memory at high key
      cardinality; streaming groups sequentially bounds peak memory at one
      sketch per task."""
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(partials.sparkSession)
    cls = SKETCHES[sketch]
    params = dict(params or {})
    key_fields = [partials.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [StructField("sketch", BinaryType(), True)]
    )

    if sketch in _SMALL_STATE:

        def merge_stream(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            accs: dict[tuple, object] = {}
            for pdf in batches:
                blobs = pdf["sketch"].to_numpy()
                groups = (
                    pdf.groupby(keys, dropna=False, sort=False).indices.items()
                    if keys
                    else [((), np.arange(len(pdf)))]
                )
                for key, idx in groups:
                    key = _norm_key(key)
                    acc = accs.get(key)
                    for b in blobs[idx]:
                        if b is None:
                            continue
                        s = cls.deserialize(bytes(b), **params)
                        acc = s if acc is None else acc.merge(s)
                    accs[key] = acc  # None stays None → zero sketch at emit
            if accs:
                rows = {name: [k[i] for k in accs] for i, name in enumerate(keys)}
                rows["sketch"] = [
                    (a if a is not None else cls(**params)).serialize()
                    for a in accs.values()
                ]
                yield pd.DataFrame(rows, columns=keys + ["sketch"])

        shuffled = (
            partials.repartition(*[F.col(k) for k in keys])
            if keys
            else partials.repartition(1)
        )
        return shuffled.mapInPandas(merge_stream, schema=out_schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        it = (bytes(b) for b in pdf["sketch"] if b is not None)
        acc = None
        for b in it:
            s = cls.deserialize(b, **params)
            acc = s if acc is None else acc.merge(s)
        if acc is None:
            acc = cls(**params)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["sketch"] = [acc.serialize()]
        return pd.DataFrame(out, columns=keys + ["sketch"])

    if keys:
        return partials.groupBy(*keys).applyInPandas(merge_group, schema=out_schema)
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: merge_group(pdf), schema=out_schema
    )


def sketch_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    sketch: str,
    params: dict | None = None,
    params_by_key=None,
) -> DataFrame:
    return sketch_merge(
        sketch_partials(df, keys, value_col, sketch, params, params_by_key),
        keys, sketch, params,
    )


def mg_items_udf():
    """binary(MG sketch) → array<struct<item,est>> for exploding a
    frequent-items summary into rows.  Post-aggregation only: runs on
    ≤|distinct keys| sketch rows, never row-scale data."""
    from pyspark.sql.types import ArrayType, LongType, StringType

    from sketchlib.mg import MisraGries

    schema = ArrayType(StructType([
        StructField("item", StringType(), True),
        StructField("est", LongType(), True),
    ]))

    @F.pandas_udf(schema)
    def f(sk: pd.Series) -> pd.Series:
        out = []
        for b in sk:
            if b is None:
                out.append(None)
            else:
                out.append([{"item": k, "est": v}
                            for k, v in MisraGries.deserialize(bytes(b)).items()])
        return pd.Series(out)

    return f


def mg_total_udf():
    """binary(MG sketch) → long total ingested weight n (for the n/(m+1)
    error bound)."""
    from pyspark.sql.types import LongType

    from sketchlib.mg import MisraGries

    @F.pandas_udf(LongType())
    def f(sk: pd.Series) -> pd.Series:
        return pd.Series([
            0 if b is None else MisraGries.deserialize(bytes(b)).n for b in sk
        ])

    return f


# ---------------------------------------------------------------------------
# One-pass multi-sketch profile
# ---------------------------------------------------------------------------

#: kinds usable in profile specs: every registry sketch plus the t-digest
#: (which lives outside SKETCHES because tdigest_ops has a specialized path)
_PROFILE_KINDS = set(SKETCHES) | {"tdigest"}


def _spec_proj(spec: dict, i: int):
    """JVM-side typed projection for one profile spec (pre-hash / cast
    happens in whole-stage codegen, exactly like the single-sketch path)."""
    kind, col = spec["kind"], spec["col"]
    alias = f"_v{i}"
    if kind in _HASHED:
        # xxhash64(NULL) = seed (42), not NULL: the null mask rides as a
        # separate boolean column (a nullable int64 would cross
        # Arrow→pandas as float64 and mangle hash low bits) so NULLs are
        # never ingested
        return [F.xxhash64(col).alias(alias),
                F.col(col).isNull().alias(f"_m{i}")]
    if kind in _RAW:
        return [F.col(col).cast("string").alias(alias)]
    return [F.col(col).cast("double").alias(alias)]  # kll, tdigest


def _spec_new(spec: dict):
    from sketchlib.tdigest.core import MergingDigest

    params = dict(spec.get("params") or {})
    if spec["kind"] == "tdigest":
        return MergingDigest(**params)
    return SKETCHES[spec["kind"]](**params)


def _spec_vals(spec: dict, pdf: pd.DataFrame, i: int):
    """(values, null_mask_or_None) — NULLs are never ingested (hashed/raw
    kinds; the double kinds drop NaN inside update_batch)."""
    series = pdf[f"_v{i}"]
    if spec["kind"] in _HASHED:
        m = pdf[f"_m{i}"].to_numpy(dtype=bool)
        vals = series.to_numpy(dtype="int64").view(np.uint64)
        return vals, (m if m.any() else None)
    if spec["kind"] in _RAW:
        vals = series.to_numpy(dtype=object)
        m = pd.isna(vals)
        return vals, (m if m.any() else None)
    return series.to_numpy(dtype="float64", na_value=np.nan), None


def profile_partials(df: DataFrame, keys: list[str], specs: list[dict]) -> DataFrame:
    """ONE scan builds partials for EVERY spec: the corpus-profile pattern.

    ``specs``: list of ``{"name": str, "col": str, "kind": str, "params":
    dict}`` where kind ∈ sketch registry ∪ {"tdigest"}.  A profile of S
    sketch families over K keys costs 1 scan + (in ``profile_aggregate``)
    1 shuffle of K·S KB-scale sketch rows — the single-sketch path costs
    S scans + S shuffles.  At 100 TB the scan IS the job; this is the
    difference between one pass over the corpus and six.

    Output is LONG format: ``keys + (sk_name string, sketch binary)``, one
    row per (partition × key × spec); ``profile_pivot`` widens it.
    Per-row ingest is the same vectorized batch path as the single-sketch
    builders — no per-row Python.
    """
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(df.sparkSession)
    names = [s["name"] for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate spec names: {names}")
    for s in specs:
        if s["kind"] not in _PROFILE_KINDS:
            raise ValueError(f"unknown sketch kind {s['kind']!r} in spec {s['name']!r}")
    narrow = df.select(
        *keys,
        *(e for i, s in enumerate(specs) for e in _spec_proj(s, i)),
    )
    key_fields = [narrow.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [StructField("sk_name", StringType(), False),
           StructField("sketch", BinaryType(), True)]
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        aggs: dict[tuple, object] = {}  # (key..., spec_idx) -> sketch
        for pdf in batches:
            vals = [_spec_vals(s, pdf, i) for i, s in enumerate(specs)]
            groups = (
                pdf.groupby(keys, dropna=False, sort=False).indices.items()
                if keys
                else [((), np.arange(len(pdf)))]
            )
            for key, idx in groups:
                key = _norm_key(key)
                for i, s in enumerate(specs):
                    agg = aggs.get(key + (i,))
                    if agg is None:
                        agg = aggs[key + (i,)] = _spec_new(s)
                    v, m = vals[i]
                    v = v[idx]
                    if m is not None:
                        v = v[~m[idx]]
                    if s["kind"] in _HASHED:
                        agg.update_hashed(v)
                    else:
                        agg.update_batch(v)
        if aggs:
            rows = {name: [k[j] for k in aggs] for j, name in enumerate(keys)}
            rows["sk_name"] = [specs[k[-1]]["name"] for k in aggs]
            rows["sketch"] = [a.serialize() for a in aggs.values()]
            yield pd.DataFrame(rows, columns=keys + ["sk_name", "sketch"])

    return narrow.mapInPandas(build, schema=out_schema)


def profile_merge(partials: DataFrame, keys: list[str], specs: list[dict]) -> DataFrame:
    """Phase 2: ONE repartition on the keys co-locates every spec's partials
    for a key; a mapInPandas accumulator merges per (key, spec) — one Python
    call per Arrow batch.  Holds (keys-per-partition × specs) sketches in
    memory at once: size profile specs accordingly (KB-scale params; a dense
    8 MB Bloom per spec belongs on the dedicated single-sketch path)."""
    from sketchlib.spark.shipping import ensure_on_workers

    from sketchlib.tdigest.core import MergingDigest

    ensure_on_workers(partials.sparkSession)
    by_name = {s["name"]: s for s in specs}
    key_fields = [partials.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [StructField("sk_name", StringType(), False),
           StructField("sketch", BinaryType(), True)]
    )

    def merge_stream(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[tuple, object] = {}  # (key..., name) -> sketch
        for pdf in batches:
            blobs = pdf["sketch"].to_numpy()
            names_col = pdf["sk_name"].to_numpy()
            groups = (
                pdf.groupby(keys, dropna=False, sort=False).indices.items()
                if keys
                else [((), np.arange(len(pdf)))]
            )
            for key, idx in groups:
                key = _norm_key(key)
                for j in idx:
                    b = blobs[j]
                    if b is None:
                        continue
                    name = names_col[j]
                    spec = by_name[name]
                    params = dict(spec.get("params") or {})
                    acc = accs.get(key + (name,))
                    if spec["kind"] == "tdigest":
                        if acc is None:
                            acc = accs[key + (name,)] = MergingDigest(**params)
                        acc.merge_bytes(bytes(b))
                    else:
                        s = SKETCHES[spec["kind"]].deserialize(bytes(b), **params)
                        accs[key + (name,)] = s if acc is None else acc.merge(s)
        if accs:
            for k, a in accs.items():
                if isinstance(a, MergingDigest):
                    a.compress()
            rows = {name: [k[j] for k in accs] for j, name in enumerate(keys)}
            rows["sk_name"] = [k[-1] for k in accs]
            rows["sketch"] = [a.serialize() for a in accs.values()]
            yield pd.DataFrame(rows, columns=keys + ["sk_name", "sketch"])

    shuffled = (
        partials.repartition(*[F.col(k) for k in keys])
        if keys
        else partials.repartition(1)
    )
    return shuffled.mapInPandas(merge_stream, schema=out_schema)


def profile_aggregate(df: DataFrame, keys: list[str], specs: list[dict]) -> DataFrame:
    """One scan + one shuffle → merged sketches for every spec (long format)."""
    return profile_merge(profile_partials(df, keys, specs), keys, specs)


def profile_pivot(profile: DataFrame, keys: list[str], specs: list[dict]) -> DataFrame:
    """Widen the long profile: one binary column per spec name.  Runs on
    sketch rows only (K·S rows) — the pivot shuffle is KB-scale."""
    names = [s["name"] for s in specs]
    return (
        profile.groupBy(*keys)
        .pivot("sk_name", names)
        .agg(F.first("sketch"))
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    delta: float = 0.01,
    discrete: bool = False,
    hll_p: int = 14,
    keys: list[str] | None = None,
) -> DataFrame:
    """Schema-driven ONE-PASS table profiler — the "describe my 100-TB
    table" operator.  Every selected column gets type-appropriate
    sketches built in a single scan + one KB-scale sketch shuffle
    (``profile_aggregate``):

    - numeric columns → a t-digest (``delta``; pass ``discrete=True``
      for exact nearest-rank quantiles on low-cardinality columns)
      + an HLL++ distinct estimate;
    - every other column → HLL++ distinct + a 1-row CMS whose exact
      ``total`` counts ingested values.

    Output: one row per column —
    ``(column, dtype, n_rows, n_vals, n_nulls, est_distinct, q50, q95)``
    with q50/q95 NULL for non-numeric columns.  ``n_rows`` rides the same
    pass (a 1-cell CMS over a constant — its ``total`` is the exact row
    count), so the whole operator is ONE lazy plan with no separate
    count() action even over filtered/joined inputs; ``n_vals`` is exact —
    the digest's total weight / the CMS total; NULLs are never ingested
    (and for floating-point columns NaN counts as missing too, the
    t-digest convention).  ``n_nulls = n_rows - n_vals``.  Metric
    extraction runs on C KB-scale sketch rows, never on the data: the
    scan cost is ONE pass regardless of how many columns are profiled
    (the dedicated single-sketch path would cost 2C scans).

    ``keys``: optional grouping columns — the per-GROUP profile (one row
    per group x column, keys prepended) from the same single pass; the
    sketch shuffle then carries one KB row per (group x spec).
    """
    from pyspark.sql.types import NumericType

    from sketchlib.cms import CMS
    from sketchlib.hll import HLL
    from sketchlib.spark.tdigest_ops import (
        tdigest_count_udf,
        tdigest_quantiles_udf,
    )

    keys = list(keys or [])
    fields = {f.name: f for f in df.schema.fields}
    cols = (list(columns) if columns is not None
            else [c for c in fields if c not in keys])
    overlap = [c for c in cols if c in keys]
    if overlap:
        raise ValueError(f"profile_table: columns {overlap} are also keys")
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"profile_table: unknown columns {unknown}")
    numeric = {c for c in cols if isinstance(fields[c].dataType, NumericType)}
    specs = []
    for i, c in enumerate(cols):
        specs.append({"name": f"h{i}", "col": c, "kind": "hll",
                      "params": {"p": hll_p}})
        if c in numeric:
            specs.append({"name": f"t{i}", "col": c, "kind": "tdigest",
                          "params": {"delta": delta, "discrete": discrete}})
        else:
            specs.append({"name": f"c{i}", "col": c, "kind": "cms",
                          "params": {"width": 32, "depth": 1}})
    # row counter rides the SAME pass: a 1-cell-wide CMS over a constant
    # counts every row exactly in its ``total`` — no separate count()
    # action, so profiling a filtered/joined input never recomputes its
    # upstream, and the whole operator stays one lazy plan
    specs.append({"name": "_rows", "col": "_ones", "kind": "cms",
                  "params": {"width": 4, "depth": 1}})
    staged = df.select(*keys, *cols).withColumn("_ones", F.lit(1))
    wide = profile_pivot(profile_aggregate(staged, keys, specs), keys, specs)

    @F.pandas_udf("double")
    def _hll_est(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None else HLL.deserialize(bytes(b)).estimate()
             for b in blobs],
            dtype="float64",
        )

    @F.pandas_udf("double")
    def _cms_total(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None else float(CMS.deserialize(bytes(b)).total)
             for b in blobs],
            dtype="float64",
        )

    # ONE projection over the single wide sketch row, exploded to one row
    # per column — a union of per-column selects would re-execute the
    # whole scan+build subtree once per column (2C scans, exactly what
    # this operator exists to avoid)
    q = tdigest_quantiles_udf([0.5, 0.95], discrete=discrete)
    n_rows = F.coalesce(_cms_total("_rows"), F.lit(0.0))
    structs = []
    for i, c in enumerate(cols):
        if c in numeric:
            n_vals = tdigest_count_udf(f"t{i}")
            q50, q95 = q(f"t{i}")[0], q(f"t{i}")[1]
        else:
            n_vals = F.coalesce(_cms_total(f"c{i}"), F.lit(0.0))
            q50 = q95 = F.lit(None).cast("double")
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.lit(fields[c].dataType.simpleString()).alias("dtype"),
            n_rows.cast("long").alias("n_rows"),
            n_vals.cast("long").alias("n_vals"),
            (n_rows - n_vals).cast("long").alias("n_nulls"),
            F.coalesce(_hll_est(f"h{i}"), F.lit(0.0)).alias("est_distinct"),
            q50.alias("q50"),
            q95.alias("q95"),
        ))
    return (
        wide.select(*keys, F.explode(F.array(*structs)).alias("_r"))
        .select(*keys, "_r.*")
    )
