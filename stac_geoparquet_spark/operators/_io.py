"""Shared input helpers for the operator modules."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from stac_geoparquet_spark.caches import register_cache

# Memoized parquet scan relations per (application, session, path,
# source stamp) — r10 optimization round.  ``spark.read.parquet``
# costs a driver-side file listing + footer/schema read (~0.25 s per
# call measured at sf0.1) and the engine's 274 declared queries
# construct >500 scans of the SAME dozen files per bench run.  A
# catalog table pays this once (the relation and its InMemoryFileIndex
# live in the catalog); bare-path reads re-list on every call.  This
# memo gives bare-path reads the catalog behavior: the value is the
# LOGICAL scan (schema + file listing) only — no rows are cached, and
# every action still computes from the parquet bytes.  The source
# stamp in the key (mtime+size, same freshness contract as the layout
# scratch) drops the memo when the file is regenerated mid-session.
# The session object rides in the value and is identity-checked on
# hit: a DataFrame is bound to its SparkSession, and handing session
# A's plan to session B's query would cross-wire SQLConf scopes
# (scan_opt's newSession ops read through their own sessions for
# exactly that reason).
_SCAN_CACHE: dict[tuple[str, str, str], tuple] = register_cache(
    "io.scans", {}
)

# read_spread's split-count probe (``df.rdd.getNumPartitions()``)
# forces analysis + physical planning of the scan (~0.1 s per call);
# the answer is a pure function of (file set, parallelism) so it is
# memoized alongside.
_SPREAD_CACHE: dict[tuple[str, str, str, int], bool] = register_cache(
    "io.spread", {}
)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Memoized ``spark.read.parquet(path)`` — one file listing +
    schema read per (session, path, stamp) instead of one per query
    construction.  Returns the same logical scan every time; callers
    compose transformations on top exactly as with a catalog table."""
    apath = os.path.abspath(path)
    key = (
        spark.sparkContext.applicationId,
        apath,
        source_stamp(apath),
    )
    hit = _SCAN_CACHE.get(key)
    if hit is not None and hit[1] is spark:
        return hit[0]
    df = spark.read.parquet(path)
    _SCAN_CACHE[key] = (df, spark)
    return df


def scan_is_multisplit(
    spark: SparkSession, path: str, target: int | None = None
) -> bool:
    """True when ``path`` scans as at least one split per core — the
    scale regime.  Same memoized plan-time probe as ``read_spread``
    (shared cache), exposed for callers that must pick a STRATEGY by
    regime rather than re-spread rows: e.g. an eager fence over a
    multi-consumer aggregate deletes a duplicate input pass (a real
    win when every core is busy) but SERIALIZES branches that a toy
    single-split fixture runs in parallel on idle cores — the r10
    ``part_affinity_topk`` regression (driver cell 1.14 -> 1.39 s,
    8->32-core scaling ratio 0.88)."""
    if target is None:
        target = spark.sparkContext.defaultParallelism
    df = scan_parquet(spark, path)
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(path),
        source_stamp(path),
        target,
    )
    spread = _SPREAD_CACHE.get(key)
    if spread is None:
        spread = df.rdd.getNumPartitions() < target
        _SPREAD_CACHE[key] = spread
    return not spread


def read_spread(
    spark: SparkSession, path: str, target: int | None = None
) -> DataFrame:
    """Read parquet, spreading the input across the cluster ONLY when
    the scan yields fewer splits than ``target`` (default: one per
    core — the single-small-file test fixture case, where one task
    would otherwise do all the per-row expression work).

    At scale this must be a no-op: a 100 TB table already scans as
    thousands of splits, and an unconditional ``repartition`` there is
    either a pointless full-table shuffle (repartition up) or a
    catastrophic parallelism collapse (repartition down to a small
    constant).  The partition count check is plan-time metadata (file
    listing), not a job — and it is memoized per (file stamp, target)
    so repeat constructions skip even the planning cost.
    """
    df = scan_parquet(spark, path)
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if not scan_is_multisplit(spark, path, target):
        return df.repartition(target)
    return df


def fenced(df: DataFrame) -> DataFrame:
    """Lineage fence for a SMALL intermediate that multiple downstream
    consumers (or a fixpoint loop) will re-read.

    Contract — apply this when BOTH hold, and only then:

    1. **Multi-consumer or iterative.**  Without the fence, Catalyst
       re-executes the whole upstream plan once per consumer (the
       covariance assembly's two reads of the merged partial matrix
       TRIPLED the 100-TB scan in the explain), and a loop's plan tree
       grows by one full copy of the body per iteration until analysis
       time itself blows up.
    2. **Bounded output.**  ``localCheckpoint`` materializes the rows
       on the executors, so the input must be bounded by something
       OTHER than corpus size — a d×d matrix, a near-dup pair graph,
       a K-row centroid table.  Never fence a corpus-sized scan; cache
       or restructure instead.

    Eager by default (same as bare ``df.localCheckpoint()``): the fence
    runs the upstream job exactly once, NOW, and every consumer reads
    the materialized blocks.  Kept as one helper so the next
    multi-consumer op inherits the contract instead of re-deriving it.
    """
    return df.localCheckpoint()


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 session 2: plain scan, no toy-file spread.  Interleaved A/B
    # at sf0.1 showed the round-robin exchange of the text column cost
    # more than every consumer's per-core work gains: tfidf 1.11 ->
    # 0.97, a synthetic 200-ln/row in-row load 1.06 -> 0.32, and the
    # relational family (which always scanned un-spread via _t) sits
    # at the bench floor.  At scale both paths are the scan's natural
    # split count; per-op opt-in via read_spread stays available for
    # any genuinely compute-bound toy-scale consumer.
    return scan_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


def source_stamp(src_file: str) -> str:
    """(mtime, size) freshness stamp of a source file — the ONE
    definition of the staleness contract every derived artifact
    (scratch layouts, bucketed tables, session caches) keys on."""
    try:
        st = os.stat(os.path.abspath(src_file))
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "missing"


# Bumped whenever the CONTENT a layout build writes changes (e.g. the
# canonical-by-id contract changed what the IVF layout holds; v3: the
# gram index switched to the canonical corpus; v4: toy-scale builds
# split the layout into one file per core so consumers' scans
# parallelize without a per-query exchange — same rows, new file
# layout).  Without it a layout materialized by older code is
# stamp-identical to the new one and would silently keep serving
# pre-upgrade content — the exact failure a long-lived cluster hits
# on an engine upgrade.
LAYOUT_FORMAT_VERSION = 4


def layout_write_partitions(
    spark: SparkSession, src_file: str, target: int | None = None
) -> int | None:
    """How many partitions a derived-layout BUILD should write, or
    ``None`` to keep the build's natural partitioning.

    Spark floors every scan split at ``spark.sql.files.openCostInBytes``
    (4 MB), so a layout that comes out as ONE small file — AQE
    advisory-size coalescing collapses any toy-scale shuffle to a
    single partition — is forever a single scan task no matter how
    many cores run the consumer (guide §6; the r10 scaling block's
    ~1.0 ratios were exactly this fixture floor).  Splitting the
    ONE-TIME build into one file per core makes every later scan of
    the layout parallel for free — unlike ``read_spread``, no
    round-robin exchange is re-paid inside each consuming query.

    Scale guard: only fires when the SOURCE is smaller than
    ``target x openCostInBytes`` (i.e. the whole table is below the
    cluster's minimum useful split volume — the toy regime).  At real
    scale the condition is false and the build keeps its natural
    multi-hundred-MB partitioning; repartitioning a 100-TB build down
    to a core-count constant would be a parallelism collapse.
    """
    if target is None:
        # Measured sweet spot, not a core count: more files buy scan
        # parallelism but every shuffle downstream pays ~8 ms per map
        # task in local mode (solo min-of-3 at sf0.1, docs canon:
        # quality_repetition 1.31 s @1 file -> 0.20 @32 -> 0.43 @8,
        # but dedup_containment 1.62 -> 3.21 @32 -> 1.63 @8 and
        # events_markov 0.44 -> 1.07 @32 -> 0.61 @8 — 32 files made
        # every shuffle-bearing consumer of the layout regress).
        # 8 files keeps the scan-bound wins and erases the shuffle
        # regressions; it is also core-count-independent, so a layout
        # built by a low-core session (the scratch path keys on source
        # stamp + format version only) serves every local config the
        # driver uses (8 and 32 cores).  Only reachable in the toy
        # regime below; at scale the function returns None and the
        # build keeps its natural partitioning.
        target = 8
    try:
        size = os.stat(os.path.abspath(src_file)).st_size
    except OSError:
        return None
    open_cost = int(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    )
    if size < target * open_cost:
        return target
    return None


# Per-process log of layout builds that actually RAN (cache misses):
# [{"layout": basename, "seconds": s}].  bench.py copies it into
# bench_detail.json so a cold-scratch run's extra wall time is
# attributable mechanically (r10 verdict item 8) — never printed on
# the one-line stdout contract.
LAYOUT_BUILD_LOG: list[dict] = []


def layout_scratch_path(src_file: str, prefix: str) -> str:
    """Scratch location for a derived layout of ``src_file``, keyed by
    the source's stamp AND the layout format version so a regenerated
    source — or upgraded build code — gets a fresh layout instead of
    silently serving stale data."""
    import hashlib
    import tempfile

    src = os.path.abspath(src_file)
    tag = hashlib.md5(
        f"{src}|{source_stamp(src)}|v{LAYOUT_FORMAT_VERSION}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")


def materialize_layout(path: str, build) -> str:
    """Build-once-publish-atomically protocol for derived layouts:
    if ``path`` already holds a _SUCCESS-marked copy, reuse it;
    otherwise call ``build(build_dir)`` to write into a private dir and
    publish with one rename.  Concurrent builders race benignly —
    whoever renames first wins (content is deterministic), the loser
    discards its copy — and no reader ever sees a half-written layout.
    """
    import shutil
    import time
    import uuid

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    build_dir = f"{path}.build-{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    try:
        build(build_dir)
        LAYOUT_BUILD_LOG.append(
            {
                "layout": os.path.basename(path),
                "seconds": round(time.perf_counter() - t0, 3),
            }
        )
        os.rename(build_dir, path)
    except OSError:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            # real failure (not a lost publish race): don't leak the
            # partial build dir — repeated retries would otherwise
            # accumulate full-size partial layouts until the disk fills
            shutil.rmtree(build_dir, ignore_errors=True)
            raise
        shutil.rmtree(build_dir, ignore_errors=True)
    except BaseException:
        # build() itself failed mid-job: clean the private dir
        shutil.rmtree(build_dir, ignore_errors=True)
        raise
    return path
