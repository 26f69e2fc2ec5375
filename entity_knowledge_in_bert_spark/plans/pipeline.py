"""The flagship ER pipeline, staged + resumable (SURVEY.md §3.2).

    pages -> extract -> mention -> block -> pairs -> score -> cluster

Each stage reads its input from the previous stage's snapshot (TableIO)
and writes a new snapshot + lineage, mirroring the reference's
``pipeline_job.py`` provides/requires DAG [R] with table semantics:
``run(..., from_stage=k)`` skips stages whose snapshot already exists —
that is the resume path (t5).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen
from ..operators import blocking, cluster, encoder, mentions, pairs, scoring
from ..operators.extract import with_extracted_text
from ..sources.tableio import TableIO

STAGES = ["extract", "mention", "block", "pairs", "score", "cluster"]

# Broadcast the mention-feature table into the pair joins while it fits
# (guide §3.1): ~300 B/row (surface + 64-float vec) => 500k rows is
# ~150 MB built — comfortably inside the 48 GB local driver and any
# production executor sizing, far under the 8 GB broadcast cap. Above
# the threshold the shuffle joins (or the bucketed mention layout) take
# over; the decision input is the snapshot manifest's row count, not a
# planner size estimate.
BROADCAST_MENTIONS_MAX_ROWS = 500_000

# persisted stage_mention schema (batch AND delta writes — a chain read
# resolves one footer's schema, so both paths must project identically):
# everything downstream consumers touch, and nothing they don't. The
# context columns exist only between detect_mentions and the encoder UDF.
MENTION_TABLE_COLS = ["mention_id", "url", "begin", "end", "surface", "vec"]


class ERPipeline:
    def __init__(
        self,
        spark: SparkSession,
        io: TableIO,
        max_block: int = 64,
        bucket_mentions: int | None = None,
        block_contract: bool = True,
    ):
        """``bucket_mentions``: write stage_mention hash-bucketed on
        mention_id into this many buckets (TableIO bucket_by). The pair
        and score stages join mentions on mention_id twice
        (pairs.attach_features) — with a bucketed layout those joins
        read straight into sort-merge joins with no exchange on the
        corpus-sized side. Off by default in the sandbox (bucket count
        is a cluster-sizing decision: ~corpus_bytes / 1 GB at 100 TB);
        exercised by tests/test_pipeline.py.

        ``block_contract``: carry the blocking key onto the match-edge
        table and group-contract each block's matched subgraph in the
        CC init (cluster.connected_components(contract_by=)) — the
        LS/SS loop then iterates over ~#(node, block) star edges
        instead of the full ~degree-dense match graph. Same cluster
        table (equality-tested). Default ON since r7 on interleaved
        same-tree A/B evidence at the 16.4M-edge scale (the regime
        where the flag has any effect at all — below the
        LOCAL_CC_MAX_EDGES cutover the exact single-task solve runs
        either way): cluster stage 58.2/78.8 s (off) vs 39.4/48.7 s
        (on), CC-loop input 16.41M -> 1.45M edges (11.3x), rows_out
        identical in all four runs (OPTIMIZATION_r07.md; r6's 400k
        probe measured the same ratios). The r6 Phase H/I scaling
        criterion was measured contraction-off on the r6 build; the r7
        cluster dataflow changed regardless (local-solve cutover), and
        contraction strictly shrinks every LS/SS iteration's shuffle,
        so the 1->4-core communication pattern is not degraded — see
        BASELINE.md r7 note. Disable via block_contract=False /
        SPARK_GRAFT_BLOCK_CONTRACT=0; a warehouse must use the SAME
        setting for base and delta runs (schema homogeneity)."""
        self.spark = spark
        self.io = io
        self.max_block = max_block
        self.bucket_mentions = bucket_mentions
        self.block_contract = block_contract
        self.timings: dict[str, float] = {}

    # each stage: read prev snapshot -> transform -> write snapshot
    def stage_extract(self, pages: DataFrame) -> None:
        """P1 filter + E1 extraction + J7 as-of. Filters run BEFORE the
        UDF (pushdown doesn't cross the Arrow boundary, §4 X10).

        r7 reorder (guide §2.3): the extractor UDF now runs BEFORE the
        as-of window, and the raw ``text``/``html`` columns are projected
        away pre-exchange — so the url shuffle carries
        (url, warc_ts, extracted, lang) instead of (url, warc_ts, html,
        text, lang): ~2.5x fewer exchange bytes at every scale, and the
        Python extractor runs at the SOURCE's parallelism instead of the
        post-shuffle width. Cost: stale url snapshots (~5% of rows) are
        extracted and then discarded by the window — per-row
        deterministic, so selecting latest-then-extract and
        extract-then-latest produce identical tables (golden-hash +
        er_extract_hashes gated)."""
        eng = mentions.english_pages(pages).select(
            "url", "warc_ts", "html", "lang"
        )
        extracted = with_extracted_text(eng).select(
            "url", "warc_ts", F.col("text_extracted").alias("text"), "lang"
        )
        latest = mentions.latest_snapshot(extracted)
        self.io.write(latest, "stage_extract", stage="extract")

    def stage_mention(self) -> None:
        pages = self.io.read("stage_extract")
        aliases = datagen.alias_df(self.spark)
        m = mentions.detect_mentions(pages, aliases)
        idf = encoder.compute_idf(self.spark, pages, "text")
        idf_bc = self.spark.sparkContext.broadcast(idf)
        embed = encoder.make_encoder_udf(idf_bc)
        m = m.withColumn("vec", embed(F.col("ctx_left"), F.col("ctx_right")))
        # project the context columns OUT of the persisted table (r7,
        # guide §2.3/§6): ctx/ctx_left/ctx_right are consumed entirely
        # pre-write (the encoder UDF above); no downstream stage or
        # export reads them, so writing ~320 chars/row of context was
        # pure write+scan bytes. MENTION_TABLE_COLS is shared with the
        # incremental delta write so base+delta chains stay
        # schema-homogeneous.
        m = m.select(*MENTION_TABLE_COLS)
        bucket = (
            (["mention_id"], self.bucket_mentions)
            if self.bucket_mentions
            else None
        )
        # persist the frozen encoder artifact: delta runs must embed with
        # the BASE corpus's IDF or their vectors drift vs stored ones
        # (plans/incremental.py reads this back). Bounded table —
        # compute_idf caps the vocabulary.
        # driver-local bounded table: ONE slice -> ONE output file (r7,
        # guide §6 — the default-parallelism createDataFrame wrote 32
        # near-empty files per run, each costing a write task + a footer
        # read). parallelize(..., 1), NOT coalesce(1): coalescing a
        # 32-slice local relation measured 6.2 s/write vs 0.46 s for a
        # single-slice parallelize (the one merged task re-walks every
        # pickled slice).
        idf_df = self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(
                list(idf.items()) or [("", 0.0)], 1
            ),
            "tok string, idf double",
        )
        # overlap the two INDEPENDENT writes (different tables — guide
        # §2.6: actions are only sequential because driver code calls
        # them sequentially): the tiny model_idf job back-fills executor
        # slots while the corpus-sized mention write runs.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self.io.write, idf_df, "model_idf",
                              stage="model_idf")
            self.io.write(m, "stage_mention", stage="mention",
                          inputs=[self.io.latest_snapshot("stage_extract")],
                          bucket_by=bucket)
            fut.result()

    def stage_block(self) -> None:
        m = self.io.read("stage_mention")
        aliases = datagen.alias_df(self.spark)
        cand = mentions.candidate_entities(m, aliases)
        # persist the frozen salt moduli (blocking artifact): delta
        # mentions must salt with the base moduli to land in the same
        # buckets as base mentions of the same entity.
        salts = blocking.entity_salts(cand, self.max_block)
        # the block-size cap trades recall; its drop count rides the
        # SAME write pass (Observation) into the stage's lineage rows so
        # the trade is auditable after the run (VERDICT r5 #8)
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import Observation

        obs = Observation()
        # the keys plan salts with the SAME deterministic moduli the
        # artifact write persists (entity_salts is a plain groupBy —
        # identical values recomputed), so the two writes are
        # independent and overlap (guide §2.6); delta runs still read
        # the persisted artifact.
        keys = blocking.block_keys(
            m, cand, max_block=self.max_block,
            salts=salts, observation=obs,
        )
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self.io.write, salts, "block_salts",
                              stage="block_salts")
            self.io.write(keys, "stage_block", stage="block",
                          inputs=[self.io.latest_snapshot("stage_mention")],
                          metrics=obs)
            fut.result()

    def stage_pairs(self) -> None:
        keys = self.io.read("stage_block")
        p = pairs.within_block_pairs(keys)
        self.io.write(p, "stage_pairs", stage="pairs",
                      inputs=[self.io.latest_snapshot("stage_block")])

    def stage_score(self) -> None:
        p = self.io.read("stage_pairs")
        m = self.io.read("stage_mention")
        aliases = datagen.alias_df(self.spark)
        # manifest row count decides the join strategy for free (guide
        # §3.1): under the threshold the mention-feature table broadcasts
        # and the vec-carrying pair table is never shuffled; above it the
        # planner keeps the shuffle joins (or the bucketed layout when
        # bucket_mentions is set).
        m_rows = self.io.snapshot_entry("stage_mention")["rows"]
        feat = pairs.attach_features(
            p, m, broadcast_mentions=m_rows <= BROADCAST_MENTIONS_MAX_ROWS
        )
        scored = scoring.score_pairs(feat, aliases)
        keep = ("block_key",) if self.block_contract else ()
        edges = scoring.match_edges(scored, keep=keep)
        self.io.write(edges, "stage_score", stage="score",
                      inputs=[self.io.latest_snapshot("stage_pairs")])

    def stage_cluster(
        self,
        durable_iterations: bool = False,
        resume_from_frontier: bool = False,
    ) -> None:
        """``durable_iterations``: additionally snapshot the CC frontier
        every iteration so a killed run resumes mid-clustering (north_rule
        checkpoint granularity); off by default — the cluster stage itself
        re-runs idempotently from stage_score in bounded time (the
        localCheckpoint durability trade; SCALING.md shuffle inventory).

        ``resume_from_frontier``: continue the CC loop from the last
        persisted ``cc_frontier`` snapshot of a killed durable run
        instead of restarting from stage_score — LS/SS is confluent, so
        the result equals an uninterrupted run (test-gated). The frontier
        snapshot records which stage_score snapshot it was derived from;
        a frontier whose lineage does not match the CURRENT stage_score
        snapshot (re-scored, deltas appended) is STALE and is ignored —
        resuming from it would silently cluster the old edge set
        (ADVICE r4: connected_components discards its edges argument when
        start_frontier is set)."""
        score_snap = self.io.latest_snapshot("stage_score")
        edges = self.io.read("stage_score")
        m = self.io.read("stage_mention")
        # manifest row count of stage_score == edge count: sizes the CC
        # frontier partitioning for free (no count() job, no 64-part clamp)
        n_edges = self.io.snapshot_entry("stage_score")["rows"]

        per_iter = None
        if durable_iterations:

            def per_iter(i: int, frontier: DataFrame) -> None:
                self.io.write(frontier, "cc_frontier",
                              stage=f"cluster_iter{i}", inputs=[score_snap])

        start = None
        if resume_from_frontier and self.io.exists("cc_frontier"):
            frontier_inputs = self.io.snapshot_entry("cc_frontier")["inputs"]
            if frontier_inputs == [score_snap]:
                start = self.io.read("cc_frontier")
            # else: stale frontier (stage_score moved on, or a pre-lineage
            # frontier with no recorded inputs) — fall back to a fresh run
        comp = cluster.connected_components(
            edges, on_iteration=per_iter, start_frontier=start,
            n_edges=n_edges,
            contract_by="block_key" if self.block_contract else None,
        )
        # comp has one row per edge-incident mention, so it is bounded by
        # the mention count — manifest-known (guide §3.1): broadcast it
        # into the left join while it fits and the mention-id side is
        # never shuffled; above the threshold the planner keeps SMJ.
        m_rows = self.io.snapshot_entry("stage_mention")["rows"]
        if m_rows <= BROADCAST_MENTIONS_MAX_ROWS:
            comp = F.broadcast(comp)
        clusters = (
            m.select("mention_id")
            .join(comp, "mention_id", "left")
            .withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.col("mention_id"))
            )
        )
        self.io.write(clusters, "stage_cluster", stage="cluster",
                      inputs=[self.io.latest_snapshot("stage_score")])

    def run(self, pages: DataFrame | None = None, from_stage: str = "extract",
            to_stage: str = "cluster") -> DataFrame:
        """Run stages [from_stage, to_stage]; earlier stages must already
        have snapshots (resume contract, t5)."""
        i0, i1 = STAGES.index(from_stage), STAGES.index(to_stage)
        for s in STAGES[i0 : i1 + 1]:
            t0 = time.time()
            if s == "extract":
                assert pages is not None, "extract stage needs the pages DataFrame"
                self.stage_extract(pages)
            else:
                getattr(self, f"stage_{s}")()
            self.timings[s] = time.time() - t0
        return self.io.read(f"stage_{to_stage}")
