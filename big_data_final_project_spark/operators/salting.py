"""Salted join for skewed keys (SCALE.md; SURVEY.md §7 M6).

A shuffle join hashes rows by key; a hot key sends its entire volume
to one reducer. Salting splits each hot left-side key into
``salt_buckets`` sub-keys and replicates the matching right-side rows
across all buckets, so the hot partition fans out ``salt_buckets``
ways. AQE's skew-join handles this adaptively for sort-merge joins;
this explicit form covers the cases AQE can't see (e.g. skew
appearing after a preceding stage, or non-SMJ plans) and documents
the pattern.

Result-equivalent to a plain inner equi-join — proven by
tests/test_salting.py against the unsalted twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_inner_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt_buckets: int = 8,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Inner equi-join on ``on`` with left-side salting.

    left gets a salt in [0, salt_buckets) derived by hashing its row
    identity (xxhash64 — cheap, uniform, no rand()) MIXED with the
    physical row position (partition id + per-partition counter):
    identity alone would send fully-identical duplicate rows of a hot
    key to one bucket, preserving exactly the skew salting exists to
    break. The positional mix keeps bucket routing deterministic for
    a deterministic input partitioning (replays recompute the same
    lineage, so retries agree); the JOIN RESULT is salt-independent
    either way — salt only routes rows, and tests/test_salting.py
    pins result-equivalence to the unsalted twin.
    """
    left_s = left.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in left.columns],
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(salt_buckets),
        ),
    )
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    right_s = right.withColumn(SALT_COL, F.explode(buckets)).withColumnRenamed(
        on, f"__r_{on}"
    )
    cond = (left_s[on] == F.col(f"__r_{on}")) & (
        left_s[SALT_COL] == right_s[SALT_COL]
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return left_s.join(right_s, cond).drop(SALT_COL, f"__r_{on}")


# Content-key skew (VERDICT r8 #1). Gram/shingle hashes are uniform in
# VALUE but content-skewed in FREQUENCY: at 100 TB the hottest
# boilerplate 8-gram has 10^7+ occurrences. A window over that key
# pins them all to one partition; and — measured in the round-9 probe
# (SCALE.md) — a plain groupBy+rejoin does NOT get AQE-skew-split
# either: the hot partition's rows are near-identical, lz4 shuffle
# compression shrinks them below the BYTE thresholds
# OptimizeSkewedJoin reads, so byte-based detection structurally
# under-detects row-heavy text-key partitions. Hence a deterministic
# skew-hint join that never relies on AQE.
SKEW_HOT_THRESHOLD_CONF = "spark.bdfp.skew.hotThreshold"
SKEW_N_SALTS_CONF = "spark.bdfp.skew.nSalts"
SKEW_N_SALTS_DEFAULT = 32
# Broadcast shortcut (VERDICT r9 #4): when the build dictionary has at
# most this many rows AND its estimated bytes fit the byte cap below,
# skip salting entirely and broadcast it — a map-side join has NO
# shuffle on the probe, so no partition can be skewed, and the result
# is identical by the same routing-independence argument. ~1M (key,
# agg) rows is tens of MB in a hashed relation — comfortably inside
# executor memory; a 100 TB gram dictionary blows past it and takes
# the salted shuffle path. Setting the hot-threshold OVERRIDE conf
# disables the shortcut so probes/tests can force the salted machinery
# deterministically.
SKEW_BROADCAST_ROWS_CONF = "spark.bdfp.skew.broadcastRows"
SKEW_BROADCAST_ROWS_DEFAULT = 1_000_000
# Byte gate (ADVICE r10): a row cap alone lets a WIDE build (string /
# array payloads pass the schema check — only count_col's presence is
# enforced) blow executor memory despite few rows. rows x pessimistic
# per-type width must also fit this cap before F.broadcast is forced.
# 64 MB keeps every narrow (key, count) dictionary the callers build
# today (1M rows x ~32 B = 32 MB) on the map-side path while a
# 1M-row build of 1 KB documents (~1 GB) falls through to salting.
SKEW_BROADCAST_BYTES_CONF = "spark.bdfp.skew.broadcastBytes"
SKEW_BROADCAST_BYTES_DEFAULT = 64 << 20
# Pessimistic per-field width estimates (bytes) for the gate. Fixed
# types use their physical width; variable-width types get sizes that
# overestimate the callers' payloads on purpose — the failure mode of
# a too-big estimate is a pointless salted shuffle (slower, correct),
# of a too-small one an executor OOM.
_TYPE_WIDTH_BYTES = {
    "boolean": 1,
    "byte": 1,
    "short": 2,
    "integer": 4,
    "float": 4,
    "date": 4,
    "long": 8,
    "double": 8,
    "timestamp": 8,
    "timestamp_ntz": 8,
    "decimal": 16,
    "string": 64,
    "binary": 64,
}
_NESTED_WIDTH_BYTES = 1024  # array/map/struct floor when unmeasured


def _estimated_row_bytes(schema) -> int:
    """Pessimistic bytes per row from the schema alone (no data scan):
    numeric/temporal fields at physical width, strings/binary at a
    generous flat estimate, nested types assumed wide. Unknown types
    fall back to the nested estimate — overestimating only costs a
    salted shuffle, underestimating risks an executor OOM. Since
    round 12 the join gate no longer trusts the flat nested constant
    (VERDICT r11 #4: an array of 100k longs is ~800 KB, not 1 KB —
    the one remaining under-estimate direction lived exactly there);
    nested fields are MEASURED from the staged build instead, and this
    schema-only estimate covers the scalar fields."""
    total = 0
    for f in schema.fields:
        name = f.dataType.typeName()
        total += _TYPE_WIDTH_BYTES.get(
            name, _NESTED_WIDTH_BYTES
        )
    return max(total, 8)


def _scalar_row_bytes(schema) -> int:
    """Schema-only pessimistic width of the SCALAR fields (the part a
    data scan can't improve much); nested/unknown fields contribute 0
    here because the gate measures their real bytes."""
    return sum(
        _TYPE_WIDTH_BYTES[f.dataType.typeName()]
        for f in schema.fields
        if f.dataType.typeName() in _TYPE_WIDTH_BYTES
    )


def _measured_fields(schema):
    """Fields whose bytes the gate MEASURES from the staged build
    (nested + unknown types), one pair of aggregates per field:
    sum(octet_length(to_json(...))) AND a binary-layout floor
    (see _binary_floor_expr); the gate takes the MAX of the two.
    JSON alone is NOT uniformly pessimistic: it over-counts strings
    (quotes, escapes) but UNDER-counts small numerics in containers —
    an array element holding 0..9 is 1-2 JSON bytes vs 8 bytes of
    UnsafeArrayData, a ~4x under-estimate in exactly the
    forced-broadcast-OOM direction the gate exists to close. The
    binary floor covers that direction; the JSON term covers wide
    strings; max() is pessimistic against both."""
    return [
        f
        for f in schema.fields
        if f.dataType.typeName() not in _TYPE_WIDTH_BYTES
    ]


def _binary_floor_expr(f):
    """Per-row lower bound (bytes) on the IN-MEMORY size of a nested
    field, from element counts x physical element width — the part of
    the layout JSON digit-compression hides. NULL containers count 0
    (size() would return -1 under the legacy conf)."""
    t = f.dataType
    name = t.typeName()
    col = F.col(f.name)
    if name == "array":
        w = _TYPE_WIDTH_BYTES.get(t.elementType.typeName(), 8)
        return (
            F.when(col.isNull(), F.lit(0))
            .otherwise(F.size(col))
            .cast("long")
            * F.lit(int(w))
        )
    if name == "map":
        kw = _TYPE_WIDTH_BYTES.get(t.keyType.typeName(), 8)
        vw = _TYPE_WIDTH_BYTES.get(t.valueType.typeName(), 8)
        return (
            F.when(col.isNull(), F.lit(0))
            .otherwise(F.size(col))
            .cast("long")
            * F.lit(int(kw + vw))
        )
    if name == "struct":
        w = sum(
            _TYPE_WIDTH_BYTES.get(sf.dataType.typeName(), 8)
            for sf in t.fields
        )
        return F.lit(int(max(w, 8))).cast("long")
    # unknown type: no structural floor available; JSON term only
    return F.lit(0).cast("long")


# Auto-detection floor: a key under this many probe rows is never
# worth salting — replicating its build row across n_salts slots
# costs more than the imbalance it could cause.
SKEW_AUTO_FLOOR = 64


def _fair_share_threshold(total: int, nparts: int) -> int:
    """The ONE formula both auto_hot_threshold and salted_skew_join
    use (ADVICE r10: two inline copies could drift): a key is HOT when
    its probe-row count alone exceeds a shuffle partition's fair share
    of the join's rows, floored at SKEW_AUTO_FLOOR."""
    return max(SKEW_AUTO_FLOOR, int(total) // max(int(nparts), 1))


def auto_hot_threshold(
    build: DataFrame, count_col: str, *, total: int | None = None
) -> int:
    """Data-derived hot threshold (VERDICT r9 #3: the static 65536
    knob becomes an override): ``_fair_share_threshold`` over the
    probe-row total and the session's shuffle partitions.

    The estimate is EXACT, not sampled: every caller's ``build`` is a
    per-key aggregate over the probe, so ``sum(count_col)`` IS the
    probe's row total, and the build is already materialize()d by
    salted_skew_join — the one extra scalar aggregate reads staged
    data (pass ``total`` to skip even that when the caller already
    has it, as salted_skew_join does). Deterministic by construction,
    and SAFE by construction either way: routing independence
    (tests/test_salting.py) means a wrong threshold degrades to the
    plain join's distribution, never to wrong rows."""
    if total is None:
        total = build.agg(F.sum(F.col(count_col))).first()[0] or 0
    nparts = int(
        build.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return _fair_share_threshold(int(total), nparts)


def salted_skew_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    count_col: str,
    probe_salt_src,
) -> DataFrame:
    """Inner equi-join of a row-heavy ``probe`` against a per-key
    ``build`` on a content-frequency-skewed ``key``, with no
    single-task hot partition — the textbook conditional-salting
    (skew-hint) join, made deterministic instead of AQE-dependent.

    ``build`` must carry ``count_col`` = the probe-side occurrence
    count of each key (the callers' builds are groupBy(key) aggregates
    over the probe, so the count is free); it is consumed by the
    router and DROPPED from the output — alias it under another name
    if the caller needs it. Keys with more occurrences than the
    AUTO-DETECTED threshold (``auto_hot_threshold``: a partition's
    fair share of the probe rows, exact, derived from the staged
    build; ``spark.bdfp.skew.hotThreshold`` overrides it) are HOT:
    their build rows are replicated across
    ``spark.bdfp.skew.nSalts`` (default 32) salt slots and their probe
    rows routed by ``probe_salt_src`` (any per-row column/expression,
    e.g. ``xxhash64(doc_id, pos)``; a NULL routes to slot 0 rather
    than dropping the row); cold keys keep a single slot 0. The hot
    set reaches the probe through a broadcast left join (map-side, no
    shuffle), so the shuffled join never sees a key slot with more
    than max(threshold, hot_n/nSalts) rows.

    SHORTCUT: when the whole build fits
    ``spark.bdfp.skew.broadcastRows`` (default 1M rows) AND its
    estimated size fits ``spark.bdfp.skew.broadcastBytes`` (default
    64 MB), and no threshold override is set, the join broadcasts the
    build outright — a map-side join shuffles nothing on the probe,
    so no skew can exist and the salting machinery would be pure
    overhead (VERDICT r9 #4: this is most of the substring family's
    local cost). The byte estimate (ADVICE r10, hardened VERDICT r11
    #4, floor added r12) is rows x pessimistic schema width for
    scalar fields plus, for each nested/unknown field, the MAX of the
    measured sum(octet_length(to_json(col))) and a binary-layout
    floor (element count x physical width) — folded into the same
    stats pass over the staged build. A 100-row build of 100k-long
    arrays can no longer sneak past a flat per-type constant, and an
    array of SMALL numerics (1-2 JSON digits vs 8 in-memory bytes per
    element) can no longer sneak past the JSON term. When an override
    IS set the shortcut is off and the byte aggregates are skipped —
    no payload-sized JSON pass for a number nobody reads. Behavior note (ADVICE r11): the 64 B
    string estimate means a 1M-row (string key, long count)
    dictionary estimates ~72 MB and takes the salted-shuffle path
    under the 64 MB default — correct, just not map-side; callers
    with narrow string keys that want the shortcut back raise
    ``spark.bdfp.skew.broadcastBytes`` explicitly. The salted shuffle
    is the path for dictionaries too big to broadcast — the actual
    100 TB regime.

    Correctness is ROUTING-INDEPENDENT: the hot set only spreads rows
    across slots; every probe row still meets exactly the build rows
    of its key, so any threshold (including a wrong one) returns the
    same rows as ``probe.join(build, key)`` — asserted in
    tests/test_salting.py. ``build`` is referenced twice (hot set +
    salted build) and is therefore STAGED here first — measured
    (SCALE.md r9): Spark's ReuseExchange does NOT fire across the
    broadcast/shuffle boundary, so without staging the whole build
    aggregate (a full pass over the probe) would run twice. The build
    is the per-key aggregate — the smallest frame in the query — and
    the staging mode follows the session's materialize() contract
    ('table' on a cluster: the gram/key dictionary is an artifact
    worth persisting anyway)."""
    from .scale import materialize

    for col in ("_hot", "_salt"):
        if col in probe.columns or col in build.columns:
            raise ValueError(
                f"salted_skew_join: reserved internal column {col!r} "
                "already present on an input"
            )
    if count_col in probe.columns:
        raise ValueError(
            f"salted_skew_join: count_col {count_col!r} also exists on the "
            "probe — the post-join reference would be ambiguous; rename one"
        )
    build = materialize(build)
    conf = probe.sparkSession.conf
    override = conf.get(SKEW_HOT_THRESHOLD_CONF, None)
    # one scalar pass over the staged build feeds ALL THREE decisions:
    # broadcast-vs-salt (row count + bytes) and the auto hot threshold
    # (total). Nested/unknown columns get their REAL bytes measured
    # here (VERDICT r11 #4: the flat 1 KB nested constant let an
    # array-of-100k-longs build pass the gate at an ~800 KB/row
    # under-estimate — the only remaining under-estimate direction,
    # and its failure mode is a forced-broadcast OOM).
    # the byte estimate only feeds the broadcast shortcut, which an
    # explicit threshold override disables — skip the (payload-sized)
    # JSON serialization entirely in that case
    measured = _measured_fields(build.schema) if override is None else []
    aggs = [F.sum(F.col(count_col)).alias("t"), F.count(F.lit(1)).alias("n")]
    for i, f in enumerate(measured):
        aggs.append(
            F.sum(
                F.octet_length(F.to_json(F.struct(F.col(f.name))))
            ).alias(f"b{i}")
        )
        aggs.append(F.sum(_binary_floor_expr(f)).alias(f"e{i}"))
    stats = build.agg(*aggs).first()
    total, n_build = int(stats["t"] or 0), int(stats["n"])
    # per-field max(JSON bytes, binary floor): JSON over-counts wide
    # strings, the floor covers digit-compressed small numerics —
    # both under-estimate directions closed (r12 review)
    measured_bytes = sum(
        max(int(stats[f"b{i}"] or 0), int(stats[f"e{i}"] or 0))
        for i in range(len(measured))
    )
    est_bytes = n_build * _scalar_row_bytes(build.schema) + measured_bytes
    bc_rows = int(
        conf.get(SKEW_BROADCAST_ROWS_CONF, str(SKEW_BROADCAST_ROWS_DEFAULT))
    )
    bc_bytes = int(
        conf.get(SKEW_BROADCAST_BYTES_CONF, str(SKEW_BROADCAST_BYTES_DEFAULT))
    )
    if (
        override is None
        and n_build <= bc_rows
        # ADVICE r10: rows alone would let a wide-payload build blow
        # memory — scalar fields gate on pessimistic schema width,
        # nested fields on their measured JSON bytes (round 12)
        and est_bytes <= bc_bytes
    ):
        # dictionary fits: map-side join, no probe shuffle, no skew
        # possible — the 100 TB case where it DOESN'T fit falls
        # through to the salted shuffle below (and probes force that
        # path by setting the threshold override or broadcastRows=0)
        return probe.join(F.broadcast(build), key).drop(count_col)
    nparts = int(conf.get("spark.sql.shuffle.partitions", "200"))
    hot_threshold = (
        int(override)
        if override is not None
        # the shared formula — auto_hot_threshold(build, count_col,
        # total=total) resolves to exactly this (ADVICE r10)
        else _fair_share_threshold(total, nparts)
    )
    n_salts = int(conf.get(SKEW_N_SALTS_CONF, str(SKEW_N_SALTS_DEFAULT)))
    is_hot = F.col(count_col) > hot_threshold
    hot = build.where(is_hot).select(key, F.lit(True).alias("_hot"))
    b = build.withColumn(
        "_salt",
        F.explode(
            F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                F.sequence(F.lit(0), F.lit(0))
            )
        ),
    ).withColumn("_salt", F.col("_salt").cast("int"))
    p = (
        probe.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.when(
                # NULL-safe (ADVICE r9): a NULL probe_salt_src on a hot
                # row routes to slot 0 instead of NULL-dropping the row
                F.col("_hot"),
                F.coalesce(
                    F.pmod(probe_salt_src, F.lit(n_salts)), F.lit(0)
                ),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("_hot")
    )
    return p.join(b, [key, "_salt"]).drop("_salt", count_col)
