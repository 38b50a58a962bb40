"""Incremental-refresh (CDC) query over `documents`
(operators/snapshot_diff.py; SURVEY.md §2B "LLM-pipeline — snapshot
diff"). The reference regenerates everything per run; a 100 TB corpus
refresh instead diffs snapshots and reprocesses only the delta.

The fixture is a deterministically perturbed copy of the corpus built
identically by both engines — every 17th doc deleted, every 13th
survivor's text revised, every 11th doc re-inserted under a fresh key
— so the diff outcome is a pure function of the input and the oracle
can state it exactly, including the md5 content hashes themselves
(both engines concatenate the compared columns with the same
null-sentinel + field-separator framing).

Scale posture (inherited from the operator): both sides reduce to
(key, md5) BEFORE the full-outer join — the shuffle carries 32-byte
hashes plus keys, never document text, and unchanged keys (the
overwhelming majority of a real refresh) drop immediately after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.incremental_agg import (
    apply_group_delta,
    cdc_group_delta,
)
from etfconstituentextractor_spark.operators.scd2 import scd2_history
from etfconstituentextractor_spark.operators.snapshot_diff import snapshot_diff
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.snapshot_table import (
    snapshot_commit,
    snapshot_read,
    snapshot_restore,
)
from etfconstituentextractor_spark.sources.tables import load

#: key shift for re-inserted docs — far beyond any real doc_id.
_INSERT_SHIFT = 10_000_000
#: the 'dv' leg's merge-on-read delete: doc_id < this threshold is
#: masked by a positional deletion vector at v3 of the snapshot table
_DV_DELETE_LT = 100

#: the md5 framing both engines share: null sentinel + unit separator.
_H = "md5(coalesce(text, chr(0) || 'null') || chr(31) || coalesce(lang, chr(0) || 'null'))"


#: the q86 family's shared output scaffold — every leg projects onto
#: these 10 typed columns after its own 'leg' literal. ONE definition
#: (round-9 review: six hand-copied 15-line selects drifted apart one
#: column at a time).
_LEG_SPEC = [
    ("doc_id", "bigint"),
    ("old_hash", "string"),
    ("new_hash", "string"),
    ("change", "string"),
    ("valid_from", "int"),
    ("valid_to", "int"),
    ("is_current", "boolean"),
    ("lang", "string"),
    ("n_docs", "bigint"),
    ("sum_chars", "bigint"),
]


def _leg_frame(df: DataFrame, leg: str, **overrides) -> DataFrame:
    """Project ``df`` onto the family scaffold: overrides map scaffold
    names to Columns/literals, scaffold columns present in ``df`` pass
    through, everything else becomes a typed NULL."""
    cols = [F.lit(leg).alias("leg")]
    for name, typ in _LEG_SPEC:
        if name in overrides:
            v = overrides[name]
            c = v if isinstance(v, Column) else F.lit(v)
        elif name in df.columns:
            c = F.col(name)
        else:
            c = F.lit(None)
        cols.append(c.cast(typ).alias(name))
    return df.select(*cols)


def _lang_agg(df: DataFrame) -> DataFrame:
    """The family's per-lang (count, char-sum) aggregate — shared by
    the timetravel/prune/merge legs and their oracles' GROUP BY."""
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).cast("bigint").alias("sum_chars"),
    )


@query(
    "q86_snapshot_diff",
    oracle=f"""
    WITH old_h AS (
      SELECT doc_id, {_H} AS old_hash FROM documents
    ),
    new_rows AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' (rev2)' ELSE text END AS text,
             lang
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + {_INSERT_SHIFT}, 'fresh ' || text, lang
      FROM documents WHERE doc_id % 11 = 0
    ),
    new_h AS (
      SELECT doc_id, {_H} AS new_hash FROM new_rows
    ),
    j AS (
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash
      FROM old_h o FULL OUTER JOIN new_h n ON o.doc_id = n.doc_id
    ),
    v3_rows AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' (rev3)' ELSE text END AS text,
             lang
      FROM new_rows WHERE doc_id % 19 <> 0
    ),
    snaps AS (
      SELECT doc_id, 1 AS version, {_H} AS row_hash FROM documents
      UNION ALL SELECT doc_id, 2, {_H} FROM new_rows
      UNION ALL SELECT doc_id, 3, {_H} FROM v3_rows
    ),
    isl AS (
      SELECT doc_id, version, row_hash,
             CASE WHEN lag(version) OVER w IS NULL
                    OR lag(version) OVER w <> version - 1
                    OR lag(row_hash) OVER w <> row_hash
                  THEN 1 ELSE 0 END AS island_start
      FROM snaps WINDOW w AS (PARTITION BY doc_id ORDER BY version)
    ),
    isl2 AS (
      SELECT *, SUM(island_start) OVER (PARTITION BY doc_id ORDER BY version
                                        ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    ),
    scd2 AS (
      SELECT doc_id, ANY_VALUE(row_hash) AS row_hash,
             CAST(MIN(version) AS INTEGER) AS valid_from,
             CAST(MAX(version) AS INTEGER) AS valid_to,
             MAX(version) = 3 AS is_current
      FROM isl2 GROUP BY doc_id, island
    )
    SELECT 'diff' AS leg, doc_id, old_hash, new_hash,
           CASE WHEN old_hash IS NULL THEN 'inserted'
                WHEN new_hash IS NULL THEN 'deleted'
                WHEN old_hash <> new_hash THEN 'updated' END AS change,
           CAST(NULL AS INTEGER) AS valid_from, CAST(NULL AS INTEGER) AS valid_to,
           CAST(NULL AS BOOLEAN) AS is_current,
           CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS sum_chars
    FROM j
    WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
    UNION ALL
    SELECT 'scd2', doc_id, CAST(NULL AS VARCHAR), row_hash,
           CAST(NULL AS VARCHAR), valid_from, valid_to, is_current,
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM scd2
    UNION ALL
    -- 'mv' leg: the RECOMPUTE of the per-lang aggregate over v2.
    -- The Spark side MAINTAINS the same aggregate incrementally
    -- (agg(v1) + cdc delta), so the hash match proves maintenance
    -- equals recompute — the materialized-view invariant.
    SELECT 'mv', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM new_rows
    GROUP BY lang
    UNION ALL
    -- 'timetravel' leg (round 8, sources/snapshot_table.py): the
    -- Spark side commits v0=overwrite(base), v1=overwrite(new),
    -- v2=append(late) to a manifest-committed snapshot table and
    -- aggregates each snapshot_read(version); the oracle restates
    -- each version from the fixtures directly, so the hash match is
    -- version isolation itself (valid_from carries the version).
    SELECT 'timetravel', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(0 AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'timetravel', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(1 AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM new_rows GROUP BY lang
    UNION ALL
    SELECT 'timetravel', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(2 AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM (
      SELECT * FROM new_rows
      UNION ALL
      SELECT doc_id + {2 * _INSERT_SHIFT}, 'late ' || text, lang
      FROM documents WHERE doc_id % 23 = 0
    ) GROUP BY lang
    UNION ALL
    -- 'dv' leg (round 10, sources/snapshot_table.py): v3 of the same
    -- snapshot table is a merge-on-read DELETE (doc_id < 100) — no
    -- data file rewritten, the rows masked by a positional deletion
    -- vector the reader anti-joins. The oracle restates v2 minus the
    -- deleted range, so the hash match proves DV application: every
    -- masked row gone, every other row intact.
    SELECT 'dv', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(3 AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM (
      SELECT * FROM new_rows
      UNION ALL
      SELECT doc_id + {2 * _INSERT_SHIFT}, 'late ' || text, lang
      FROM documents WHERE doc_id % 23 = 0
    ) WHERE doc_id >= {_DV_DELETE_LT}
    GROUP BY lang
    UNION ALL
    -- 'cdf' leg (round 10): the INCREMENTAL change feed between v2
    -- and v3 (the DV delete) — snapshot_changes reads only the files
    -- whose deletion-vector coverage grew, never the unchanged
    -- corpus; the oracle restates the deleted slice of v2 directly.
    SELECT 'cdf', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           'deleted', CAST(3 AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM new_rows WHERE doc_id < {_DV_DELETE_LT}
    UNION ALL
    -- 'prune' leg: v2 filtered to doc_id >= 2*shift == exactly the
    -- late append (the Spark side plans it via manifest column
    -- stats; the result must equal the plain filtered aggregate)
    SELECT 'prune', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(2 AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM (SELECT 'late ' || text AS text, lang FROM documents WHERE doc_id % 23 = 0)
    GROUP BY lang
    UNION ALL
    -- 'merge' leg: copy-on-write upsert over the doc_id%8 slice —
    -- target rows with matched keys replaced by the source's revision,
    -- unmatched source rows inserted; the oracle restates the merged
    -- world relationally (the file-minimality half of the contract is
    -- manifest-level and pinned in tests/test_snapshot_table.py)
    SELECT 'merge', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM (
      SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' (rev2)' ELSE text END AS text,
             lang
      FROM documents WHERE doc_id % 8 = 0
      UNION ALL
      SELECT 'fresh ' || text, lang
      FROM documents WHERE doc_id % 8 = 0 AND doc_id % 11 = 0
    ) GROUP BY lang
    UNION ALL
    -- 'restore' leg (round 11): snapshot_restore(0) after the merge —
    -- the restored head must restate the PRE-merge base slice exactly
    -- (the rollback references v0's immutable files; the merge's
    -- copy-on-write rewrite must not have disturbed them)
    SELECT 'restore', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BOOLEAN),
           lang, COUNT(*), CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
    FROM documents WHERE doc_id % 8 = 0
    GROUP BY lang
    """,
)
def q86_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged family: leg='diff' is the two-version CDC delta; leg=
    'scd2' (round 6, operators/scd2.py) collapses THREE deterministic
    snapshot versions into type-2 validity intervals — v3 perturbs v2
    again (every 19th key deleted, every 7th survivor revised), so
    delete/re-insert gaps and multi-revision keys all occur."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    survivors = d.filter(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" (rev2)"))
        ).otherwise(F.col("text")),
    )
    inserts = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(_INSERT_SHIFT)).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
        "lang",
    )
    new = survivors.unionByName(inserts)
    diff = _leg_frame(
        snapshot_diff(d, new, keys=["doc_id"], compare_cols=["text", "lang"]),
        "diff",
        lang=None,  # the diff's corpus lang column is not leg output
    )
    v3 = new.filter(F.col("doc_id") % 19 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" (rev3)"))
        ).otherwise(F.col("text")),
    )
    hist_raw = scd2_history(
        [(1, d), (2, new), (3, v3)], keys=["doc_id"], compare_cols=["text", "lang"]
    )
    hist = _leg_frame(hist_raw, "scd2", new_hash=F.col("row_hash"))
    # 'mv' leg (round 7, operators/incremental_agg.py): MAINTAIN the
    # per-lang (count, char-sum) aggregate through the v1->v2 delta —
    # agg(v1) + cdc_group_delta(v1, v2) — while the oracle RECOMPUTES
    # the same aggregate from v2 directly; the hash match is the
    # materialized-view invariant (maintenance == recompute), with
    # cost O(changed keys) instead of O(corpus) on the Spark side.
    base = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).cast("bigint").alias("m"),
    )
    delta = cdc_group_delta(
        d, new, key_col="doc_id", group_col="lang", measure_expr="length(text)"
    )
    mv = _leg_frame(
        apply_group_delta(base, delta, group_col="lang"),
        "mv",
        n_docs=F.col("n"),
        sum_chars=F.col("m"),
    )

    # 'timetravel' leg (round 8, sources/snapshot_table.py): commit
    # the version chain to a manifest-committed snapshot table —
    # v0=overwrite(base), v1=overwrite(new), v2=append(late arrivals)
    # — then aggregate each snapshot_read(version). Old versions stay
    # readable after later commits, appends extend the parent's file
    # list, and nothing re-reads the corpus: the hash match against
    # the oracle's per-version restatement IS version isolation. The
    # table build is corpus-fingerprinted like q22's bucketed tables
    # (commits are the amortized once-per-refresh cost; steady-state
    # reads are manifest-planned scans).
    late = d.filter(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + F.lit(2 * _INSERT_SHIFT)).alias("doc_id"),
        F.concat(F.lit("late "), F.col("text")).alias("text"),
        "lang",
    )
    # v1 is range-laid on doc_id so the v3 DV delete's coverage (and
    # therefore the 'cdf' leg's scan) concentrates in the low-range
    # file — the layout a real table clustered on its key would have,
    # and what makes the feed's O(changed files) claim measurable
    # (hash layout spread the deleted range across every file)
    tbl = _timetravel_table(
        spark,
        sf_dir,
        [
            (d, "overwrite"),
            (new.repartitionByRange(4, "doc_id"), "overwrite"),
            (late, "append"),
        ],
        deletes=[("doc_id", "<", _DV_DELETE_LT)],
    )
    tt_legs = [
        _leg_frame(_lang_agg(snapshot_read(spark, tbl, v)), "timetravel", valid_from=v)
        for v in (0, 1, 2)
    ]
    # 'dv' leg (round 10): v3 is a merge-on-read DELETE — the rows
    # with doc_id < threshold are masked by a positional deletion
    # vector (no data file rewritten; the manifest's file list at v3
    # == v2's, pinned in tests/test_snapshot_table.py). The read
    # anti-joins the DV on (file key, row position); the oracle
    # restates v2 minus the range, so the hash match IS correct DV
    # application. Note v2's timetravel leg above reads the SAME
    # files pre-delete — time travel across a delete, under one hash.
    tt_legs.append(
        _leg_frame(_lang_agg(snapshot_read(spark, tbl, 3)), "dv", valid_from=3)
    )
    # 'cdf' leg (round 10): the incremental change feed v2 -> v3 —
    # O(changed files): only the DV-grown files are read, never the
    # unchanged corpus (sources/snapshot_table.py:snapshot_changes);
    # the oracle restates the deleted slice, so the hash match is
    # feed ≡ full-read diff on this table.
    from etfconstituentextractor_spark.sources.snapshot_table import snapshot_changes

    cdf = snapshot_changes(spark, tbl, 2, 3, keys=["doc_id"]).select(
        "doc_id", "change"
    )
    tt_legs.append(_leg_frame(cdf, "cdf", valid_from=3))
    # 'prune' leg (round 9): the SAME snapshot table read through the
    # manifest's column stats — where=(doc_id >= 2*shift) proves every
    # v0/v1 data file empty (their per-file doc_id max < 2*shift) and
    # plans ONLY v2's appended late files; the oracle restates the
    # late fixture directly, so the hash match is pruned-read ≡
    # full-scan-filter. The file-skipping itself is pinned by
    # tests/test_plans.py::test_q86_prune_leg_plans_fewer_files.
    prune = _leg_frame(
        _lang_agg(snapshot_read(spark, tbl, 2, where=("doc_id", ">=", 2 * _INSERT_SHIFT))),
        "prune",
        valid_from=2,
    )
    # 'merge' leg (round 9): snapshot_merge END-TO-END under the hash
    # — the doc_id%8 base slice upserted with the familiar
    # perturbation (every 13th revised, every 11th re-inserted under
    # key+shift), then aggregated. The oracle restates the merged
    # world relationally; the copy-on-write minimality half (which
    # files rewrote) is manifest-level and stays pinned in
    # tests/test_snapshot_table.py. Round 11: the table is
    # fingerprint-CACHED (_merge_table) — the completed
    # base→merge→restore chain is immutable once built, so reruns
    # read v1/v2 instead of re-running ~1.2s of commit machinery;
    # the hash oracle re-checks the VALUES every run regardless.
    mtbl = _merge_table(spark, sf_dir)
    merged = _leg_frame(_lang_agg(snapshot_read(spark, mtbl, 1)), "merge")
    # 'restore' leg (round 11): v2 = snapshot_restore(0) — the rolled-
    # back head must restate the ORIGINAL slice exactly: the oracle is
    # the pre-merge base, so the hash match proves the rollback
    # surfaced the old data AND that the merge's rewrite didn't
    # disturb the files v0 still references (protocol half — expired
    # targets, DV/watermark carry, vacuum liveness — pinned in
    # tests/test_snapshot_table.py).
    restored = _leg_frame(_lang_agg(snapshot_read(spark, mtbl, 2)), "restore")

    out = (
        diff.unionByName(hist)
        .unionByName(mv)
        .unionByName(prune)
        .unionByName(merged)
        .unionByName(restored)
    )
    for leg in tt_legs:
        out = out.unionByName(leg)
    return out


def _merge_table(spark, sf_dir):
    """Build (or reuse) the q86 merge/restore table: v0 = the
    doc_id % 8 base slice, v1 = the copy-on-write ``snapshot_merge``
    of the familiar perturbation source (every 13th revised, every
    11th re-inserted under key+shift), v2 = ``snapshot_restore(0)``.

    Fingerprint-cached like _timetravel_table (round-11 trim: the
    fresh-table-per-run build cost ~1.1-1.3s of every q86 run).
    "Merge mutates version history" is why an in-place table can't be
    re-merged — but the COMPLETED v0→v1→v2 chain is immutable once
    built, so reruns only READ it; a corpus refresh (or any missing
    manifest/data file) invalidates and rebuilds, and the merged /
    restored VALUES stay under the q86 hash oracle every run, so a
    stale or partial cache cannot pass. The merge PROTOCOL semantics
    (rewrite minimality, concurrency, DV carry) stay pinned per-run
    in tests/test_snapshot_table.py, where tables are always fresh."""
    import json as _json
    import os
    import shutil
    import tempfile

    from etfconstituentextractor_spark.sources.fingerprint import table_fingerprint
    from etfconstituentextractor_spark.sources.snapshot_table import snapshot_merge

    import hashlib

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"etfce_mergetbl_{tag}")
    fp = {"documents": table_fingerprint(sf_dir, "documents"), "recipe": 2}
    # GENERATION dir keyed by the fingerprint: a corpus refresh builds
    # a NEW generation instead of rmtree'ing the served path — a lazy
    # q86 frame returned before the refresh still references its own
    # generation's files (the round-9 dangling-frame hazard the
    # unique-per-call design guarded against; round-11 review caught
    # the cache reintroducing it). Stale generations are bounded by
    # corpus refreshes and swept only when provably not this one.
    gen = hashlib.md5(
        _json.dumps(fp, sort_keys=True).encode()
    ).hexdigest()[:12]
    gdir = os.path.join(base, f"gen-{gen}")
    table = os.path.join(gdir, "table")
    marker = os.path.join(gdir, "_fingerprint.json")
    if not _snapshot_cache_fresh(table, marker, fp, 3):
        # build-then-rename publish (the stage_chunks discipline —
        # round-11 third review: two processes cold-starting the same
        # generation previously rmtree'd each other's in-flight
        # build); a lost rename race adopts the winner's identical
        # generation, any other failure serves the scratch build
        build = f"{gdir}.build-{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        os.makedirs(build)
        gdir_final = gdir
        gdir = build
        table = os.path.join(gdir, "table")
        marker = os.path.join(gdir, "_fingerprint.json")
        d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
        # one-file base + no stats: each stats pass is an extra agg
        # job; the stats-assisted merge path is pinned at pytest tier
        slice_ = d.filter(F.col("doc_id") % 8 == 0).coalesce(1)
        snapshot_commit(slice_, table, mode="overwrite")
        # derive the merge source from the COMMITTED one-file table,
        # not the corpus: value-identical, touches one tiny file
        base_rows = snapshot_read(spark, table, 0)
        src = (
            base_rows.filter(F.col("doc_id") % 13 == 0)
            .withColumn("text", F.concat(F.col("text"), F.lit(" (rev2)")))
            .unionByName(
                base_rows.filter(F.col("doc_id") % 11 == 0).select(
                    (F.col("doc_id") + F.lit(_INSERT_SHIFT)).alias("doc_id"),
                    F.concat(F.lit("fresh "), F.col("text")).alias("text"),
                    "lang",
                )
            )
        )
        mv = snapshot_merge(src, table, key="doc_id")
        assert mv == 1, f"merge expected to commit v1, got v{mv}"
        rv = snapshot_restore(spark, table, 0)
        assert rv == 2, f"restore expected to commit v2, got v{rv}"
        with open(marker, "w") as fh:
            _json.dump(fp, fh)
        try:
            os.rename(gdir, gdir_final)
            table = os.path.join(gdir_final, "table")
        except OSError:
            if _snapshot_cache_fresh(
                os.path.join(gdir_final, "table"),
                os.path.join(gdir_final, "_fingerprint.json"),
                fp,
                3,
            ):  # lost the race to a valid winner
                shutil.rmtree(gdir, ignore_errors=True)
                table = os.path.join(gdir_final, "table")
            else:
                # gdir_final exists but is STALE/PARTIAL (a killed
                # build published, or tmp cleanup ate data files):
                # without healing, the rename fails on every future
                # run and each leaks a fresh .build-<pid> (round-12
                # advice). Move the carcass aside and claim — the
                # aside stays on disk (dangling-frame discipline:
                # a concurrent run may still be lazily scanning it).
                try:
                    os.rename(gdir_final, f"{gdir_final}.stale-{os.getpid()}")
                    os.rename(gdir, gdir_final)
                    table = os.path.join(gdir_final, "table")
                except OSError:
                    pass  # serve the scratch build at `table` as-is
        _sweep_dead_builds(base)
    return table


#: scratch builds / stale asides younger than this are never swept.
#: Builds take seconds and aside-scanning frames live minutes, so six
#: hours is conservative; the constant exists so tests can tighten it.
#: Deployments override per-host via $SPARK_GRAFT_SWEEP_AGE_SEC
#: (round-14 verdict ask: the bench host's 6h is not a law of nature —
#: a 100 TB shared-fs table may want it looser, a disk-tight CI
#: tighter). Read at sweep time so a long-lived service picks up an
#: operator's change without a restart.
_SWEEP_AGE_SEC = 6 * 3600


def _sweep_age_sec() -> float:
    import os

    try:
        return float(os.environ["SPARK_GRAFT_SWEEP_AGE_SEC"])
    except (KeyError, ValueError):
        return float(_SWEEP_AGE_SEC)


def _subtree_newest_mtime(p):
    """Newest mtime across ``p`` and everything under it, or None when
    the subtree vanished. A top-level dir's mtime reflects only its
    DIRECT children (round-14 advice): a slow build writing under
    build/table/ keeps the deep files fresh while the top-level dir
    ages past any cutoff — liveness must be judged on the subtree."""
    import os

    newest = None
    try:
        st = os.stat(p)
        newest = st.st_mtime
    except OSError:
        return None
    for dirpath, dirnames, filenames in os.walk(p):
        for name in dirnames + filenames:
            try:
                m = os.stat(os.path.join(dirpath, name)).st_mtime
            except OSError:
                continue
            if m > newest:
                newest = m
    return newest


def _sweep_dead_builds(base):
    """Remove abandoned ``*.build-<pid>`` scratch dirs and aged
    ``*.stale-*`` asides (round-12 advice; rule revised round 13, and
    again round 14 on advice). History of the gate: the original local
    ``os.kill(pid, 0)`` probe alone was wrong twice over — on a shared
    filesystem another HOST's in-flight build looks dead and got
    rmtree'd mid-build, while local pid RECYCLING could keep a dead
    carcass alive indefinitely. Round 13 switched to top-level dir
    mtime age, which over-corrected (round-14 advice): a directory's
    mtime reflects only its DIRECT children, so a slow build writing
    deep under build/table/ — or an aside a reader is still lazily
    scanning past the cutoff — aged out at the top level while its
    subtree was demonstrably alive. The gate is now TWO conditions,
    both required to sweep:

    1. the NEWEST mtime anywhere in the subtree is older than the
       cutoff (a writer anywhere keeps the whole tree alive), and
    2. the owner pid embedded in the name is not alive locally (the
       conservative direction of the old probe: a live pid always
       keeps its dir; a recycled pid merely delays the sweep until
       that pid exits, which only leaks disk, never data).

    Residual caveat, documented not solved: a pure READER on another
    shared-fs host updates no mtimes and owns no local pid — it is
    protected only by the age cutoff, which is why the cutoff is
    hours, not minutes, and per-deployment tunable
    ($SPARK_GRAFT_SWEEP_AGE_SEC)."""
    import os
    import re as _re
    import shutil
    import time

    try:
        names = os.listdir(base)
    except OSError:
        return
    cutoff = time.time() - _sweep_age_sec()
    for n in names:
        m = _re.search(r"\.(?:build|stale)-(\d+)$", n)
        if m is None:
            # unowned name shapes (e.g. legacy ``.stale-`` without a
            # pid suffix) fall back to the age-only rule
            if not (".build-" in n or ".stale-" in n):
                continue
            pid = None
        else:
            pid = int(m.group(1))
        p = os.path.join(base, n)
        newest = _subtree_newest_mtime(p)
        if newest is None:
            continue  # vanished under us — someone else swept it
        if newest >= cutoff:
            continue  # fresh somewhere in the subtree: in flight
        if pid is not None:
            try:
                os.kill(pid, 0)
                continue  # owner alive locally — never sweep
            except ProcessLookupError:
                pass  # owner gone: old AND orphaned -> sweep
            except OSError:
                continue  # EPERM etc.: someone owns it — keep
        shutil.rmtree(p, ignore_errors=True)


def _snapshot_cache_fresh(table, marker, fp, n_roots):
    """Shared freshness check for fingerprint-cached snapshot tables
    (_timetravel_table, _merge_table): marker matches AND every root
    manifest is present with every referenced data file and DV dir on
    disk (tmp cleanup can eat the large data files while keeping the
    small marker — that must rebuild, never serve a partial read)."""
    import json as _json
    import os
    import re as _re

    if not os.path.exists(marker):
        return False
    try:
        with open(marker) as fh:
            if _json.load(fh) != fp:
                return False
        mdir = os.path.join(table, "_manifests")
        names = sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []
        # ROOT manifests only: vN-shard-*.json files also end in
        # .json, so a sharded inventory would make this count never
        # equal the expected roots and the cache would rebuild every
        # run — perf-only, but silently (round-10 advice)
        manifests = [n for n in names if _re.match(r"^v\d{8}\.json$", n)]
        if len(manifests) != n_roots:
            return False
        for n in manifests:
            with open(os.path.join(mdir, n)) as fh:
                m = _json.load(fh)
            if "files" in m:
                files = m["files"]
            else:
                # sharded inventory: resolve each shard doc (round-11
                # review — m["files"] KeyError'd into the blanket
                # except, silently rebuilding every run)
                files = []
                for ref in m.get("shards", []):
                    with open(os.path.join(table, ref["path"])) as fh:
                        files += _json.load(fh)["files"]
            if not all(os.path.exists(os.path.join(table, f)) for f in files):
                return False
            dv = m.get("dv")
            if dv and not os.path.isdir(os.path.join(table, dv["dir"])):
                return False
        return True
    except (OSError, ValueError, KeyError):
        return False


def _timetravel_table(spark, sf_dir, commits, deletes=()):
    """Build (or reuse) the q86 snapshot table: one commit per
    (frame, mode) in order, then one merge-on-read
    ``snapshot_delete`` per ``deletes`` where-tuple (round 10).
    Corpus-fingerprinted with the shared sources/fingerprint.py
    identity (per-file name+size+mtime_ns — the replay.py
    postmortem's rule); a refresh of documents.parquet invalidates
    and rebuilds, and so does ANY missing manifest, data file, or
    deletion-vector dir (tmp cleanup can eat the large data files
    while keeping the small marker — that must rebuild, never serve a
    partial or permanently-crashing read; a missing DV dir would
    crash the reads that mask by it)."""
    import json as _json
    import os
    import shutil
    import tempfile

    from etfconstituentextractor_spark.sources.fingerprint import table_fingerprint

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"etfce_snaptable_{tag}")
    table = os.path.join(base, "table")
    fp = {
        "documents": table_fingerprint(sf_dir, "documents"),
        "deletes": [list(w) for w in deletes],
        "recipe": 6,
    }
    marker = os.path.join(base, "_fingerprint.json")
    fresh = _snapshot_cache_fresh(table, marker, fp, len(commits) + len(deletes))
    if not fresh:
        from etfconstituentextractor_spark.sources.snapshot_table import snapshot_delete

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base)
        for frame, mode in commits:
            snapshot_commit(frame, table, mode=mode, stats_cols=["doc_id"])
        for w in deletes:
            snapshot_delete(spark, table, where=tuple(w))
        with open(marker, "w") as fh:
            _json.dump(fp, fh)
    return table
