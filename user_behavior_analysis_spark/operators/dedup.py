"""Deduplication operators for training-data pipelines.

Engine extensions beyond the reference's surface (per the build brief):
exact dedup, MinHash+LSH near-dup candidates, SimHash fingerprints, and
n-gram Jaccard verification. All are pure DataFrame compositions —
shingle explode → hash (md5-prefix, cross-engine deterministic) → group
— so they scale by partitioning on doc/shingle keys and never hold a
per-executor dictionary.

Scale notes (100 TB posture):
* exact dedup is one hash-shuffle on the fingerprint;
* MinHash: explode(shingles) is the big intermediate — it's a map-side
  explode immediately collapsed by a partial min-aggregate per
  (doc, seed) before the shuffle, so the exchange carries
  docs × num_hashes rows only;
* LSH banding joins on (band_idx, band_hash) — hot buckets (boilerplate
  docs) are the classic skew source; AQE skew-join handles moderate
  skew, and a bucket-size cap (``max_bucket``) drops degenerate buckets
  the way production LSH pipelines do;
* n-gram Jaccard join is reserved for *verifying* candidate pairs, not
  all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..fanout import fan_out
from ..functions.text import fingerprint, md5_prefix_hash, tokens, word_ngrams


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct normalized text: surviving (min) id + count."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
          .groupBy("fp")
          .agg(F.min(id_col).alias("keep_id"),
               F.count(F.lit(1)).alias("dup_cnt"))
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str,
                  ngram: int) -> DataFrame:
    """Non-distinct (doc_id, g) word-shingle relation — map-side only.

    The projected 2-column input is fanned out across cores before the
    CPU-heavy tokenize/explode stage (fanout.fan_out: an added exchange
    only when the scan is narrower than the cluster, identity at scale).
    """
    return (
        fan_out(df.select(F.col(id_col).alias("doc_id"),
                          F.col(text_col).alias("t")))
          .withColumn("toks", tokens("t"))
          .withColumn("g", F.explode(word_ngrams("toks", ngram)))
          .select("doc_id", "g")
    )


#: modulus for the double-hashing family: largest prime < 2^59, so
#: h1 + i*h2 stays under 2^63 for any useful i without overflow.
MINHASH_P = (1 << 59) - 55


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       num_hashes: int = 12, ngram: int = 3) -> DataFrame:
    """Per-doc MinHash signature via Kirsch-Mitzenmacher double hashing:
    ONE md5 per shingle yields (h1, h2) from disjoint 15-hex-digit
    halves, and hash i is (h1 + i*h2) mod P — the standard trick that
    gives k independent-enough hash functions for the price of one.
    Columns mh0..mh{n-1}.

    min() is duplicate-insensitive, so the shingles are deliberately NOT
    deduped: the explode feeds a partial min per (doc, seed) map-side and
    only docs × num_hashes accumulators cross the single exchange.
    """
    sh = _doc_shingles(df, text_col, id_col, ngram)
    md5 = F.md5(F.col("g"))
    h1 = (F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
          % MINHASH_P).alias("h1")
    h2 = (F.conv(F.substring(md5, 16, 15), 16, 10).cast("long")
          % MINHASH_P).alias("h2")
    hashed = sh.select("doc_id", h1, h2)
    aggs = [F.min((F.col("h1") + F.lit(i) * F.col("h2")) % MINHASH_P)
             .alias(f"mh{i}")
            for i in range(num_hashes)]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      num_hashes: int = 12, bands: int = 4,
                      ngram: int = 3, max_bucket: int = 1000) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    bands × rows_per_band = num_hashes; a band's bucket key is the md5 of
    its minhash concat. Returns distinct (doc_a < doc_b) pairs.
    """
    rows_per = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, ngram)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per + r}").cast("string")
                 for r in range(rows_per)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.md5(F.concat_ws("_", *parts)).alias("bh")))
    buckets = (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb"))
           .select("doc_id", F.col("bb.band").alias("band"),
                   F.col("bb.bh").alias("bh"))
    )
    # cap degenerate buckets (boilerplate shingle sets) before the self-join
    sized = buckets.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bh")))
    small = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    a = small.alias("a")
    # The banded relation is FACT-sized (docs × bands): pin the self-join
    # to shuffle-hash so Catalyst's size estimate — small only at test
    # scale — can never pick a broadcast build that OOMs at 100×.
    b = small.hint("shuffle_hash").alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
         .select(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
         .distinct()
    )


def verify_pairs_jaccard(df: DataFrame, pairs: DataFrame, text_col: str,
                         id_col: str, ngram: int = 3,
                         threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard for CANDIDATE pairs only — the verification
    stage between LSH banding and cluster resolution.

    Unlike ``ngram_jaccard_pairs`` (inverted-index join over every pair
    sharing a shingle — the exhaustive/bench form), this computes the
    intersection by joining the shingle relation onto the candidate
    list twice: cost is O(|pairs| × shingles-per-doc), independent of
    how many non-candidate docs share common shingles. At 100 TB the
    candidate list is tiny relative to the corpus, so this is the shape
    a production pipeline runs.

    Returns (doc_a, doc_b, jaccard) for candidates meeting ``threshold``.
    """
    raw = (_doc_shingles(df, text_col, id_col, ngram)
           .select("doc_id", md5_prefix_hash(F.col("g")).alias("gh")))
    if threshold > 0:
        # set sizes ride the SAME doc-keyed dedup window and travel
        # WITH the posting rows through the intersection join (max()
        # aggregates of a per-doc constant), so the separate sizes
        # aggregate and the two size join-backs disappear. A pair with
        # zero common shingles can never reach a positive threshold,
        # so the left-join + coalesce(0) shape is only kept for the
        # threshold <= 0 contract edge below (interleaved A/B vs the
        # join-back shape on dedup_pipeline: 3.65 -> 2.98 s).
        sh = _posting_dedup_sized(raw, "doc_id", "gh", "n")
        sa = sh.select(F.col("doc_id").alias("doc_a"),
                       F.col("gh").alias("gha"), F.col("n").alias("na"))
        sb = sh.select(F.col("doc_id").alias("b2"),
                       F.col("gh").alias("ghb"), F.col("n").alias("nb"))
        return (
            pairs.select("doc_a", "doc_b")
                 .join(sa, "doc_a")
                 .join(sb, (F.col("doc_b") == F.col("b2"))
                       & (F.col("gha") == F.col("ghb")))
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count(F.lit(1)).alias("inter_n"),
                      F.max("na").alias("na"), F.max("nb").alias("nb"))
                 .withColumn("jaccard",
                             F.col("inter_n").cast("double")
                             / (F.col("na") + F.col("nb")
                                - F.col("inter_n")))
                 .where(F.col("jaccard") >= threshold)
                 .select("doc_a", "doc_b", "jaccard")
        )
    sh = raw.distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("gh").alias("gha"))
    sb = sh.select(F.col("doc_id").alias("b2"), F.col("gh").alias("ghb"))
    inter = (
        pairs.select("doc_a", "doc_b")
             .join(sa, "doc_a")
             .join(sb, (F.col("doc_b") == F.col("b2"))
                   & (F.col("gha") == F.col("ghb")))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("inter_n"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.select("doc_a", "doc_b")
             .join(inter, ["doc_a", "doc_b"], "left")
             .join(na, "doc_a").join(nb, "doc_b")
             .withColumn("jaccard",
                         F.coalesce("inter_n", F.lit(0)).cast("double")
                         / (F.col("na") + F.col("nb")
                            - F.coalesce("inter_n", F.lit(0))))
             .where(F.col("jaccard") >= threshold)
             .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 25) -> DataFrame:
    """Min-label connected components over an undirected edge list —
    the cluster-resolution step between LSH candidate pairs and an
    actual keep/drop decision. Returns one (node, rep) row per node
    appearing in ``pairs``; ``rep`` is the smallest node id in the
    component.

    Algorithm: iterative neighbor-min propagation plus a pointer-jumping
    (path-halving) step per round, so label convergence is
    O(log diameter) rounds rather than O(diameter) — the same plan the
    large-star/small-star map-reduce CC algorithms use, expressed as two
    DataFrame joins per round. Each round's result is checkpointed to
    truncate the lineage (iterative self-joins otherwise grow the plan
    exponentially); local checkpoints here, a reliable checkpoint dir on
    a real cluster. Per round: one shuffle for the neighbor-min groupBy
    and one for the pointer-jump self-join — each carries exactly one
    row per node/edge, never a materialized component.

    Raises RuntimeError if labels haven't converged after ``max_iter``
    rounds (duplicate clusters from LSH are shallow; hitting the cap
    means the input is not a near-dup graph).
    """
    # Materialize the pair lineage ONCE before mirroring: ``pairs`` is
    # typically the expensive end of a candidate pipeline (LSH banding,
    # Jaccard verification, blocked cosine), and a union of two reads of
    # it would execute that lineage twice inside the first checkpoint.
    p0 = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
               .localCheckpoint(eager=True))
    edges = p0.union(p0.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
    # Initialize labels at min(self, min neighbor) — the first
    # propagation half-round fused into initialization (same groupBy
    # shuffle the identity init would need for the distinct, one fewer
    # loop iteration on every shallow near-dup graph).
    # lazy: round 1's convergence count materializes this together with
    # its own checkpoint — no standalone init job (p0 above stays eager
    # because its lineage is the expensive pair pipeline and the union
    # reads it twice before any cache exists).
    labels = (edges.groupBy("u").agg(F.min("v").alias("mv"))
                   .select(F.col("u").alias("node"),
                           F.least(F.col("u"), F.col("mv")).alias("rep"))
              ).localCheckpoint(eager=False)
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.select(F.col("node").alias("v"), "rep"), "v")
                 .groupBy("u").agg(F.min("rep").alias("nrep"))
                 .select(F.col("u").alias("node"), "nrep")
        )
        new = (
            labels.join(nbr, "node", "left")
                  .select("node", F.col("rep").alias("old"),
                          F.least(F.col("rep"),
                                  F.coalesce("nrep", F.col("rep")))
                          .alias("rep"))
        )
        # pointer jump: rep <- rep's current rep (path halving). Every
        # rep is itself a node (it's a min over node ids), so the inner
        # self-join is total. The pre-round label rides along as ``old``
        # so convergence is read off the SAME checkpointed frame — no
        # extra join back to ``labels``. ONE driver action per round:
        # the lazy localCheckpoint is materialized BY the convergence
        # count itself (the count computes every partition of the
        # marked RDD, which caches them), instead of an eager
        # checkpoint job followed by a separate isEmpty job — per
        # round that halves the driver barriers on the critical path,
        # the same latency at sf0.1 and on a 1000-node cluster.
        jumped = (
            new.alias("x")
               .join(new.alias("y"), F.col("x.rep") == F.col("y.node"))
               .select(F.col("x.node").alias("node"),
                       F.col("x.old").alias("old"),
                       F.col("y.rep").alias("rep"))
        ).localCheckpoint(eager=False)
        moved = jumped.where(F.col("old") != F.col("rep")).count()
        labels = jumped.select("node", "rep")
        if moved == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """The dedup pipeline's last step: resolve candidate pairs into
    duplicate clusters and a canonical keep/drop decision.

    Output: one row per document — (doc_id, cluster_rep, keep) where
    ``cluster_rep`` is the smallest doc_id in the document's near-dup
    component (itself for singletons) and ``keep`` marks the one
    surviving representative per cluster. ``where(~keep)`` IS the drop
    set a training pipeline consumes.
    """
    comps = connected_components(pairs, max_iter=25)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
            .join(comps.select(F.col("node").alias("doc_id"), "rep"),
                  "doc_id", "left")
            .select("doc_id",
                    F.coalesce("rep", F.col("doc_id")).alias("cluster_rep"))
            .withColumn("keep", F.col("doc_id") == F.col("cluster_rep"))
    )


def dedup_clusters_keep_best(docs: DataFrame, pairs: DataFrame,
                             id_col: str = "doc_id",
                             score_col: str = "n_chars") -> DataFrame:
    """``dedup_clusters`` with QUALITY-AWARE survivor election: instead
    of the smallest id, each cluster keeps its highest-``score_col``
    member (ties → smallest id) — the RefinedWeb/production rule
    ("keep the longest/cleanest duplicate"), which min-id resolution
    gets wrong whenever the best copy is not the first-crawled one.

    Scale shape on top of the component resolution: one
    cluster_rep-keyed max_by aggregate (the argmax rides a struct
    ordering, no window/sort) and one cluster_rep-keyed join back —
    both on the same key, and the argmax relation is one row per
    cluster. Deterministic under any partitioning: the max_by struct
    (score, -id) never ties between distinct docs."""
    comps = connected_components(pairs, max_iter=25)
    assign = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(score_col).alias("_score"))
            .join(comps.select(F.col("node").alias("doc_id"), "rep"),
                  "doc_id", "left")
            .select("doc_id",
                    F.coalesce("rep", F.col("doc_id")).alias("cluster_rep"),
                    "_score"))
    best = assign.groupBy("cluster_rep").agg(
        F.max_by("doc_id", F.struct(F.col("_score"),
                                    (-F.col("doc_id")).alias("_nid")))
         .alias("best_id"))
    return (assign.join(best, "cluster_rep")
                  .select("doc_id", "cluster_rep",
                          (F.col("doc_id") == F.col("best_id"))
                          .alias("keep")))


def simhash_neardup_pairs(df: DataFrame, text_col: str, id_col: str,
                          bits: int = 16, max_hamming: int = 3,
                          max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs within ``max_hamming`` SimHash bits, found by
    block-permutation banding (Manku/Jain/Sarma, WWW'07): split the
    fingerprint into ``max_hamming + 1`` contiguous bit-bands — any pair
    at Hamming distance ≤ k must agree EXACTLY on at least one band
    (pigeonhole), so band-equality buckets are a lossless candidate
    generator. Candidates are then verified with the exact popcount of
    the XOR, all JVM-side (`bit_count` is whole-stage-codegen'd).

    Same scale posture as ``minhash_lsh_pairs``: the only exchanges are
    the fingerprint aggregate, the band-bucket self-join, and the final
    distinct — no all-pairs stage. ``max_bucket`` caps degenerate bands
    (e.g. the all-zeros band common on short docs) before the self-join.
    At production scale use bits=64 with 4×16-bit bands (2^16 buckets
    per band); 16 bits is the oracle-tractable demo configuration.
    """
    bands = max_hamming + 1
    assert bits % bands == 0, "bits must divide evenly into k+1 bands"
    width = bits // bands
    mask = (1 << width) - 1
    sig = simhash(df, text_col, id_col, bits=bits)
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.shiftright("simhash", b * width)
                  .bitwiseAND(F.lit(mask)).alias("bb"))
        for b in range(bands)
    ]
    buckets = (
        sig.select("doc_id", "simhash",
                   F.explode(F.array(*band_cols)).alias("x"))
           .select("doc_id", "simhash", F.col("x.band").alias("band"),
                   F.col("x.bb").alias("bb"))
    )
    sized = buckets.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bb")))
    small = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    # fact-sized self-join: pinned shuffle-hash, same rule as the LSH
    # band join — never a broadcast build that only fits at test scale
    a, b = small.alias("a"), small.hint("shuffle_hash").alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bb") == F.col("b.bb"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
         .where(ham <= max_hamming)
         .select(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"),
                 ham.cast("int").alias("hamming"))
         .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        ngram: int = 3, threshold: float = 0.8,
                        df_cap: int | None = None,
                        recover_saturated: bool = True,
                        sat_num_hashes: int = 16, sat_bands: int = 8,
                        sat_bucket_cap: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard over the inverted-index join: pairs sharing
    ≥1 shingle, scored |∩| / |A∪B|, kept at ≥ threshold.

    The division is BIGINT/BIGINT → double of identical operands on both
    engines, so values are bit-reproducible.

    ``df_cap`` (VERDICT r6 #1 — the embedding_neardup treatment): the
    inverted-index self-join's cost is Σ df² per shingle, and
    boilerplate shingles (df ~ corpus size) make that quadratic in the
    corpus. With the cap set, the pair-counting join runs over RARE
    shingles only (df ≤ cap) — same map-side-combined shape as the
    exhaustive join, never a materialized candidate list — and the
    capped-out COMMON shingles are handled exactly in two cheap steps:
    (1) an UPPER-BOUND filter admits only pairs that could still reach
    the threshold if they shared every common shingle possible
    (|∩| ≤ inter_rare + min(common_a, common_b)); (2) the few
    survivors' true common-shingle intersection is counted against the
    tiny common relation, restoring the EXACT Jaccard value. Results
    therefore equal the exhaustive join for every pair sharing ≥1
    rare shingle.

    ``recover_saturated`` (ADVICE r7): a pair invisible to the rare
    join shares ONLY common shingles, and at threshold t that forces
    c ≥ |∩| ≥ t·max(nₐ, n_b) on BOTH endpoints — every missed pair
    lives inside the SATURATED doc set {c ≥ t·n}. Exactly those docs
    are the large fuzzy near-dup families (every family shingle has
    df ≈ family size > cap) that exact-hash dedup cannot catch, so
    they get a bounded second detector: MinHash signatures over the
    staged postings of saturated docs only, LSH-banded
    (``sat_num_hashes``/``sat_bands`` — 16/8 puts band-collision
    probability ≥ 1-(1-t²)^8 ≈ 0.9997 at t=0.8), buckets
    deterministically truncated to ``sat_bucket_cap`` docs by id, and
    every band candidate not already covered by the rare join scored
    EXACTLY against the full posting set. Candidate generation is
    probabilistic (banding can miss a borderline pair); every emitted
    value is exact, and the construction is oracle-reproduced
    hash-for-hash. When no shingle exceeds the cap the saturated set
    is empty and the plan degenerates to the exhaustive join plus
    cheap vocabulary-keyed exchanges. Callers derive the cap from the
    corpus count (integer-only, oracle-mirrored); pass None for the
    pure exhaustive join.
    """
    # The shingle relation feeds three plan branches (sizes + both join
    # sides). Deliberately NOT persisted: caching replaces the relation
    # with an InMemoryRelation whose unknown stats block the broadcast
    # Catalyst otherwise picks for the size-lookup joins (measured 3.5×
    # slower with persist at sf0.1). Recompute + exchange reuse wins; at
    # petabyte scale the shingles would be staged to a temp table.
    #
    # Shingles are reduced to 60-bit md5-prefix hashes BEFORE the distinct
    # and the self-join: every downstream exchange then carries 8-byte
    # keys instead of ~25-byte n-gram strings, and the join compares
    # longs. Set semantics survive because the same hash is applied in
    # the oracle (collisions, if any, collide identically).
    raw = _doc_shingles(df, text_col, id_col, ngram) \
        .select("doc_id", md5_prefix_hash(F.col("g")).alias("gh"))
    if df_cap is not None:
        # STAGE the df-tagged index once: six downstream branches
        # (rare ×2, common ×2, sizes, csizes) read the materialized
        # relation instead of re-running the tokenize→md5 pipeline per
        # branch — the in-process analog of staging shingles to a temp
        # table at petabyte scale. Safe against the no-persist note
        # below because every join in this branch is explicitly
        # shuffle-hash-pinned (no broadcast decision is left to the
        # checkpoint's unknown stats).
        #
        # The (doc_id, gh) dedup is FOLDED INTO the vocabulary-keyed
        # window pass (guide §2.4: operations keyed the same way share
        # one exchange): one hash(gh) exchange + one (gh, doc_id) sort
        # dedupes (lag against the previous doc_id) AND counts df_n,
        # where distinct-then-window paid a second full exchange of
        # the posting relation (hash(doc_id, gh) for the distinct,
        # hash(gh) for the window). Within-doc repeat shingles are
        # rare, so distinct's map-side partial combine saved almost
        # nothing — the extra exchange was pure cost (interleaved A/B:
        # jaccard 4.33→3.53 s, triangles −0.55/−0.20 s). Per-gh
        # partitions are df-bounded only for rare shingles, but both
        # window functions stream the sorted run (no buffering), so a
        # boilerplate shingle costs a long sorted run, not memory.
        wo = Window.partitionBy("gh").orderBy("doc_id")
        shd = (raw.withColumn("_pv", F.lag("doc_id").over(wo))
                  .where(F.col("_pv").isNull()
                         | (F.col("_pv") != F.col("doc_id")))
                  .drop("_pv")
                  .withColumn("df_n", F.count(F.lit(1)).over(
                      Window.partitionBy("gh")))
                  .localCheckpoint(eager=True))
        rare = shd.where(F.col("df_n") <= df_cap).select("doc_id", "gh")
        common = shd.where(F.col("df_n") > df_cap).select("doc_id", "gh")
        if common.isEmpty():
            # Runtime short-circuit off the staged index (one cheap
            # filter scan of the in-memory checkpoint): when NO shingle
            # exceeds the cap — the sf-domain density, "max df 25 vs
            # cap 128" — the capped algebra reduces EXACTLY to the
            # exhaustive join (rare == all postings, every c == 0, so
            # the upper-bound admission IS the exact Jaccard, the
            # common-intersection join adds 0, and the saturated set
            # {c >= t*n} is empty), yet its plan still carried the
            # common branches and the whole MinHash recovery pass as
            # empty exchanges and AQE stages. Build the reduced plan
            # instead; any over-cap shingle keeps the full capped +
            # recovery construction below (the x10/x30 probes engage
            # it by construction). Interleaved A/B: jaccard 3.67→2.64,
            # triangles −1.0/−1.2 s.
            ra, rb = rare.alias("a"), rare.hint("shuffle_hash").alias("b")
            ir = (ra.join(rb, (F.col("a.gh") == F.col("b.gh"))
                          & (F.col("a.doc_id") < F.col("b.doc_id")))
                    .groupBy(F.col("a.doc_id").alias("doc_a"),
                             F.col("b.doc_id").alias("doc_b"))
                    .agg(F.count(F.lit(1)).alias("ir")))
            sizes = shd.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n"))
            sa = sizes.select(F.col("doc_id").alias("doc_a"),
                              F.col("n").alias("na"))
            sb = sizes.select(F.col("doc_id").alias("doc_b"),
                              F.col("n").alias("nb"))
            return (ir.join(sa.hint("shuffle_hash"), "doc_a")
                      .join(sb.hint("shuffle_hash"), "doc_b")
                      .withColumn("jaccard",
                                  F.col("ir").cast("double")
                                  / (F.col("na") + F.col("nb")
                                     - F.col("ir")))
                      .where(F.col("jaccard") >= threshold)
                      .select("doc_a", "doc_b", "jaccard"))
        # per-doc totals AND capped-out counts in ONE doc-keyed pass
        stats = shd.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("df_n") > df_cap).cast("long")).alias("c"))
        # rare-only pair counting: the exhaustive join's shape (direct
        # map-side-combined aggregate, NO candidate materialization)
        # with per-shingle fan-out bounded by the cap
        ra, rb = rare.alias("a"), rare.hint("shuffle_hash").alias("b")
        ir = (ra.join(rb, (F.col("a.gh") == F.col("b.gh"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
                .groupBy(F.col("a.doc_id").alias("doc_a"),
                         F.col("b.doc_id").alias("doc_b"))
                .agg(F.count(F.lit(1)).alias("ir")))
        sa = stats.select(F.col("doc_id").alias("doc_a"),
                          F.col("n").alias("na"), F.col("c").alias("ca"))
        sb = stats.select(F.col("doc_id").alias("doc_b"),
                          F.col("n").alias("nb"), F.col("c").alias("cb"))
        scored = (ir.join(sa.hint("shuffle_hash"), "doc_a")
                    .join(sb.hint("shuffle_hash"), "doc_b")
                    .withColumn("m", F.least("ca", "cb")))
        # upper-bound admission: |∩| ≤ ir + m, so J ≤ (ir+m)/(na+nb-ir-m)
        # — identical int/int→double division in both engines
        surv = scored.where(
            (F.col("ir") + F.col("m")).cast("double")
            / (F.col("na") + F.col("nb") - F.col("ir") - F.col("m"))
            >= threshold)
        # exact common-shingle intersection, survivors only
        csa = common.select(F.col("doc_id").alias("doc_a"),
                            F.col("gh").alias("gha"))
        csb = common.select(F.col("doc_id").alias("b2"),
                            F.col("gh").alias("ghb"))
        ic = (surv.select("doc_a", "doc_b")
                  .join(csa.hint("shuffle_hash"), "doc_a")
                  .join(csb.hint("shuffle_hash"),
                        (F.col("doc_b") == F.col("b2"))
                        & (F.col("gha") == F.col("ghb")))
                  .groupBy("doc_a", "doc_b")
                  .agg(F.count(F.lit(1)).alias("ic")))
        inter_n = F.col("ir") + F.coalesce(F.col("ic"), F.lit(0))
        base = (surv.join(ic, ["doc_a", "doc_b"], "left")
                    .withColumn("jaccard",
                                inter_n.cast("double")
                                / (F.col("na") + F.col("nb") - inter_n))
                    .where(F.col("jaccard") >= threshold)
                    .select("doc_a", "doc_b", "jaccard"))
        if not recover_saturated:
            return base
        # --- saturated-family recovery (ADVICE r7, see docstring) ---
        # every relation below is empty whenever no doc is ≥threshold
        # common — the sf-domain case — so the added stages cost only
        # their (empty) exchanges there; all joins stay SHJ-pinned for
        # the same unknown-stats reason as above.
        sat = (stats.where(F.col("c").cast("double")
                           >= F.lit(threshold) * F.col("n"))
                    .select("doc_id"))
        satp = (shd.join(sat.hint("shuffle_hash"), "doc_id")
                   .select("doc_id", "gh"))
        # Kirsch-Mitzenmacher double hashing over the 60-bit shingle
        # hash's decimal string — ONE md5 per posting, k mins map-side
        # (minhash_signatures' exact trick, re-keyed on gh so the
        # oracle replays it from the shared `sh` CTE)
        m5 = F.md5(F.col("gh").cast("string"))
        hashed = satp.select(
            "doc_id",
            (F.conv(F.substring(m5, 1, 15), 16, 10).cast("long")
             % MINHASH_P).alias("h1"),
            (F.conv(F.substring(m5, 16, 15), 16, 10).cast("long")
             % MINHASH_P).alias("h2"))
        sig = hashed.groupBy("doc_id").agg(
            *[F.min((F.col("h1") + F.lit(i) * F.col("h2")) % MINHASH_P)
               .alias(f"mh{i}") for i in range(sat_num_hashes)])
        rows_per = sat_num_hashes // sat_bands
        band_cols = []
        for bnd in range(sat_bands):
            parts = [F.col(f"mh{bnd * rows_per + r}").cast("string")
                     for r in range(rows_per)]
            band_cols.append(F.struct(
                F.lit(bnd).alias("band"),
                F.md5(F.concat_ws("_", *parts)).alias("bh")))
        buckets = (sig.select("doc_id",
                              F.explode(F.array(*band_cols)).alias("bb"))
                      .select("doc_id", F.col("bb.band").alias("band"),
                              F.col("bb.bh").alias("bh")))
        # deterministic truncation (NOT whole-bucket drop: an over-cap
        # bucket IS the giant family this pass exists to catch) — keep
        # the first `sat_bucket_cap` ids per bucket, the hub_cap move
        trunc = (buckets.withColumn(
                     "rn", F.row_number().over(
                         Window.partitionBy("band", "bh")
                               .orderBy("doc_id")))
                       .where(F.col("rn") <= sat_bucket_cap).drop("rn"))
        ta, tb = trunc.alias("a"), trunc.hint("shuffle_hash").alias("b")
        cand = (ta.join(tb, (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.bh") == F.col("b.bh"))
                        & (F.col("a.doc_id") < F.col("b.doc_id")))
                  .select(F.col("a.doc_id").alias("doc_a"),
                          F.col("b.doc_id").alias("doc_b"))
                  .distinct()
                  # pairs sharing ≥1 rare shingle are already EXACT in
                  # the base path — recovery owns only the invisible rest
                  .join(ir.select("doc_a", "doc_b").hint("shuffle_hash"),
                        ["doc_a", "doc_b"], "left_anti"))
        pa = shd.select(F.col("doc_id").alias("doc_a"),
                        F.col("gh").alias("g2a"))
        pb = shd.select(F.col("doc_id").alias("b3"),
                        F.col("gh").alias("g2b"))
        sint = (cand.join(pa.hint("shuffle_hash"), "doc_a")
                    .join(pb.hint("shuffle_hash"),
                          (F.col("doc_b") == F.col("b3"))
                          & (F.col("g2a") == F.col("g2b")))
                    .groupBy("doc_a", "doc_b")
                    .agg(F.count(F.lit(1)).alias("in_n")))
        rec = (sint.join(sa.hint("shuffle_hash"), "doc_a")
                   .join(sb.hint("shuffle_hash"), "doc_b")
                   .withColumn("jaccard",
                               F.col("in_n").cast("double")
                               / (F.col("na") + F.col("nb")
                                  - F.col("in_n")))
                   .where(F.col("jaccard") >= threshold)
                   .select("doc_a", "doc_b", "jaccard"))
        return base.unionByName(rec)
    sh = raw.distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # Every relation here is CORPUS-scaled (shingles ~ docs x |text|,
    # sizes ~ |docs|): pin all three joins to shuffle-hash so Catalyst's
    # size estimate — small only at test scale — can never pick a
    # broadcast build that OOMs at 100x (same rule as the LSH band
    # self-join below; r4 creeper audit found these unpinned).
    a, b = sh.alias("a"), sh.hint("shuffle_hash").alias("b")
    inter = (
        a.join(b, (F.col("a.gh") == F.col("b.gh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
         .groupBy(F.col("a.doc_id").alias("doc_a"),
                  F.col("b.doc_id").alias("doc_b"))
         .agg(F.count(F.lit(1)).alias("inter_n"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa.hint("shuffle_hash"), "doc_a")
             .join(sb.hint("shuffle_hash"), "doc_b")
        .withColumn("jaccard",
                    F.col("inter_n").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("inter_n")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str, id_col: str,
            bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint over token md5-prefix hashes.

    Each token votes ±1 on each of ``bits`` bit positions; sign of the
    sum sets the output bit. 16 bits keeps the SQL twin tractable while
    demonstrating the real partition-parallel shape (explode → per-bit
    conditional sums → single aggregate per doc).
    """
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
          .withColumn("tok", F.explode(tokens("t")))
          .select("doc_id", md5_prefix_hash(F.col("tok")).alias("h"))
    )
    votes = [
        F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sh = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * F.lit(1 << i)
        sh = term if sh is None else (sh + term)
    return agg.select("doc_id", sh.cast("long").alias("simhash"))


def unit_dedup_reconstruct(df: DataFrame, text_col: str, id_col: str,
                           unit_tokens: int = 20,
                           split_lines: bool = False) -> DataFrame:
    """Corpus-level unit (paragraph/line) exact dedup WITH document
    reconstruction — the RefinedWeb/C4 "line dedup" pass: split every
    document into units, keep only the globally FIRST occurrence of
    each distinct unit (ordered by (doc id, position)), and re-assemble
    each document from its surviving units in original order.

    Two unit splitters, same contract downstream (the operator works
    over (doc_id, unit_idx, unit_text) rows, not over how units were
    cut): the default fixed ``unit_tokens``-token chunker (for corpora
    without newlines, like the synthetic testdata), and the real
    line/paragraph path ``split_lines=True`` — ``split(text, '\\n')``
    with empty lines dropped, reconstruction joining on '\\n' — the
    cut every RefinedWeb/C4-style pipeline actually uses.

    Output: one row per document with ≥1 unit —
    (doc_id, n_units, n_kept, cleaned_text); documents whose every unit
    first appeared elsewhere collapse to cleaned_text = ''.

    100 TB shape: two shuffles total. (1) keep-first ranking: a window
    partitioned by (xxhash64(unit), unit) — hashing first gives the
    exchange narrow, evenly-bucketed keys while the full string in the
    key guards hash collisions; within a partition the sort is
    (doc_id, unit_idx), so the "first occurrence" rule is total-order
    deterministic. (2) reconstruction: group back on doc_id,
    sort_array over (unit_idx, unit) structs — per-doc arrays are
    bounded by document length, never by corpus size. The explode is
    map-side; nothing row-local leaves Tungsten until the ranking
    exchange.
    """
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias(text_col))
    if split_lines:
        sep = "\n"
        units_arr = F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
            lambda x: x != "")
        exploded = (
            src.select("doc_id", units_arr.alias("u"))
               .where(F.size("u") > 0)
               .select("doc_id", F.posexplode("u").alias("uidx", "unit"))
        )
    else:
        sep = " "
        t = F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                     lambda x: x != "")
        n_units = F.ceil(F.size("t") / F.lit(unit_tokens)).cast("int")
        units = F.transform(
            F.sequence(F.lit(0), n_units - 1),
            lambda i: F.concat_ws(
                " ", F.slice("t", i * unit_tokens + 1, unit_tokens)))
        exploded = (
            src.select("doc_id", t.alias("t"))
               .where(F.size("t") > 0)
               .select("doc_id", F.posexplode(units).alias("uidx", "unit"))
        )
    w = (Window.partitionBy(F.xxhash64("unit"), F.col("unit"))
               .orderBy("doc_id", "uidx"))
    ranked = exploded.withColumn(
        "kept", F.row_number().over(w) == 1)
    packed = F.sort_array(F.collect_list(
        F.struct(F.col("uidx"), F.col("kept"), F.col("unit"))))
    return (ranked.groupBy("doc_id")
                  .agg(F.count(F.lit(1)).cast("long").alias("n_units"),
                       F.sum(F.col("kept").cast("long")).alias("n_kept"),
                       packed.alias("p"))
                  .select("doc_id", "n_units", "n_kept",
                          F.array_join(
                              F.transform(
                                  F.filter("p", lambda s: s["kept"]),
                                  lambda s: s["unit"]),
                              sep).alias("cleaned_text")))


def allpairs_jaccard_join(df: DataFrame, text_col: str, id_col: str,
                          ngram: int = 3,
                          threshold: float = 0.6) -> DataFrame:
    """EXACT shingle-set Jaccard self-join via AllPairs/PPJoin prefix
    filtering (Bayardo et al., WWW'07) — the lossless complement to the
    probabilistic LSH family: every pair with J ≥ threshold is emitted,
    none invented, no banding false-negative rate to tune.

    Algorithm: order the shingle universe rarest-first (ascending
    document frequency, hash as tiebreak). If J(x, y) ≥ t then x and y
    share at least ⌈t·|x|⌉ elements, so their
    length-(|x| - ⌈t·|x|⌉ + 1) prefixes under the global order must
    intersect — candidate generation only joins the PREFIX posting
    lists, whose elements are by construction the rarest in each
    document. A size filter (t·max ≤ min) prunes further; survivors are
    verified with an exact array_intersect. Sets are word ``ngram``
    shingles reduced to 60-bit md5-prefix longs BEFORE everything
    (narrow exchanges, long-vs-long joins — same trick as
    ngram_jaccard_pairs; the oracle hashes identically).

    All threshold gates run in integer cross-multiplied form
    (1000·inter ≥ thr‰·union) so the keep set is bit-identical across
    engines; ``threshold`` must therefore be a multiple of 0.001.

    100 TB shape: the df table is vocabulary-scaled and the
    shingle/prefix relations corpus-scaled — every join is pinned
    shuffle-hash so Catalyst's test-scale size estimates can never pick
    a broadcast build that OOMs at 100×. The rarest-first prefix is
    what bounds the candidate join: a shingle with document frequency d
    contributes at most d·(d-1)/2 candidate pairs, and high-df
    (boilerplate) shingles are pushed out of every prefix long enough
    to matter — the same reason production AllPairs runs without an
    explicit df cap.
    """
    thr_m = int(round(threshold * 1000))
    # tk feeds three consumers (df table, rank window, verify sets) and
    # the prefix feeds both self-join sides: without staging, the
    # scan→shingle→hash pipeline re-executes ~5x (the same fan-out
    # substring_containment hit). localCheckpoint materializes each
    # narrow relation once — at petabyte scale this is the temp-table
    # staging step.
    # (doc_id, tok) dedup FOLDED into the vocabulary-keyed df window
    # (guide §2.4, the ngram_jaccard_pairs treatment): one hash(tok)
    # exchange + (tok, doc_id) sort both dedupes (lag against the
    # previous doc_id) and counts dfr, where distinct-then-window paid
    # a second full exchange of the posting relation (interleaved A/B:
    # 3.25→3.08 s).
    wo = Window.partitionBy("tok").orderBy("doc_id")
    tk = (_doc_shingles(df, text_col, id_col, ngram)
          .select("doc_id", md5_prefix_hash(F.col("g")).alias("tok"))
          .withColumn("_pv", F.lag("doc_id").over(wo))
          .where(F.col("_pv").isNull()
                 | (F.col("_pv") != F.col("doc_id")))
          .drop("_pv")
          .withColumn("dfr", F.count(F.lit(1)).over(
              Window.partitionBy("tok")))
          .localCheckpoint(eager=False))
    # Per-doc rarest-first position + set size off ONE doc_id exchange:
    # the rank window and the count window share the hash partitioning.
    w_pos = Window.partitionBy("doc_id").orderBy("dfr", "tok")
    w_all = Window.partitionBy("doc_id")
    ranked = (tk.withColumn("pos", F.row_number().over(w_pos))
                .withColumn("n", F.count(F.lit(1)).over(w_all)))
    # minimal overlap ⌈t·n⌉ in exact integer form; prefix keeps positions
    # 1 .. n - ⌈t·n⌉ + 1.
    min_ov = (F.lit(thr_m) * F.col("n") + F.lit(999)) / F.lit(1000)
    prefix = (ranked.where(F.col("pos") <= F.col("n")
                           - F.floor(min_ov).cast("int") + 1)
                    .select("doc_id", "tok", "n", "pos")
                    .localCheckpoint(eager=False))
    # PPJoin position filter (lossless): a prefix match at sorted
    # positions (pos_a, pos_b) bounds the achievable overlap by
    # 1 + min(remaining suffixes); pairs whose bound already misses
    # ⌈t/(1+t)·(na+nb)⌉ never reach verification. Integer
    # cross-multiplied: (1000+thr)·ub ≥ thr·(na+nb).
    overlap_ub = F.lit(1) + F.least(F.col("a.n") - F.col("a.pos"),
                                    F.col("b.n") - F.col("b.pos"))
    a, b = prefix.alias("a"), prefix.hint("shuffle_hash").alias("b")
    cand = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                   & (F.col("a.doc_id") < F.col("b.doc_id"))
                   & (F.lit(1000) * F.least("a.n", "b.n")
                      >= F.lit(thr_m) * F.greatest("a.n", "b.n"))
                   & (F.lit(1000 + thr_m) * overlap_ub
                      >= F.lit(thr_m) * (F.col("a.n") + F.col("b.n"))))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.n").alias("na"), F.col("b.n").alias("nb"))
             .distinct()
             # the candidate relation feeds FIVE exec subtrees (cdocs
             # union ×2, its repeat under each packed side, the verify
             # join) and exchange reuse does not fire across them —
             # staging it makes the prefix self-join run ONCE
             .localCheckpoint(eager=False))
    # Verify sets are materialized ONLY for docs that appear in some
    # candidate pair (left-semi restriction): the collect_list cost is
    # candidate-bounded, never corpus-bounded — the same
    # "verify-only-candidates" rule as verify_pairs_jaccard.
    cdocs = (cand.select(F.col("doc_a").alias("doc_id"))
                 .union(cand.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    packed = (tk.join(cdocs.hint("shuffle_hash"), "doc_id", "left_semi")
                .groupBy("doc_id")
                .agg(F.sort_array(F.collect_list("tok")).alias("toks"))
                # read twice (pa, pb): stage so the semi-join +
                # collect_list aggregate run once, not per side
                .localCheckpoint(eager=False))
    pa = packed.select(F.col("doc_id").alias("doc_a"),
                       F.col("toks").alias("ta"))
    pb = packed.select(F.col("doc_id").alias("doc_b"),
                       F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("long")
    return (cand.join(pa.hint("shuffle_hash"), "doc_a")
                .join(pb.hint("shuffle_hash"), "doc_b")
                .withColumn("inter_n", inter)
                .withColumn("union_n",
                            F.col("na") + F.col("nb") - F.col("inter_n"))
                .where(F.lit(1000) * F.col("inter_n")
                       >= F.lit(thr_m) * F.col("union_n"))
                .select("doc_a", "doc_b", "inter_n", "union_n",
                        (F.col("inter_n").cast("double")
                         / F.col("union_n")).alias("jaccard")))


def _posting_dedup_sized(sh: DataFrame, key_col: str, item_col: str,
                         size_col: str) -> DataFrame:
    """Dedupe a (key, item) posting relation AND attach the per-key set
    size in ONE key-partitioned window pass: sort by item within the
    key, drop rows equal to their predecessor (lag), count the
    survivors — where distinct-then-count-window paid a second full
    exchange of the postings (hash(key, item) for the distinct,
    hash(key) for the window). Guide §2.4; the ngram_jaccard_pairs /
    allpairs treatment, keyed by document here."""
    wo = Window.partitionBy(key_col).orderBy(item_col)
    return (sh.withColumn("_pv", F.lag(item_col).over(wo))
              .where(F.col("_pv").isNull()
                     | (F.col("_pv") != F.col(item_col)))
              .drop("_pv")
              .withColumn(size_col, F.count(F.lit(1)).over(
                  Window.partitionBy(key_col))))


def corpus_dedup_index(corpus: DataFrame, text_col: str, id_col: str,
                       ngram: int = 3,
                       stage: bool = False) -> tuple[DataFrame, DataFrame]:
    """The two corpus-side index relations incremental dedup probes:
    (fingerprint set, deduped shingle inverted index with set sizes).
    A production pipeline maintains these incrementally; ``stage=True``
    localCheckpoints them so a long-lived consumer (the streaming
    micro-batch loop) builds them ONCE instead of per batch."""
    fp_old = corpus.select(F.col(id_col).alias("old_id"),
                           fingerprint(text_col).alias("fp"))
    sh_old = _posting_dedup_sized(
        _doc_shingles(corpus, text_col, id_col, ngram)
        .select(F.col("doc_id").alias("old_id"),
                md5_prefix_hash(F.col("g")).alias("gh")),
        "old_id", "gh", "nb")
    if stage:
        fp_old = fp_old.localCheckpoint(eager=True)
        sh_old = sh_old.localCheckpoint(eager=True)
    return fp_old, sh_old


def incremental_dedup_status(corpus: DataFrame, batch: DataFrame,
                             text_col: str, id_col: str,
                             ngram: int = 3,
                             threshold: float = 0.8,
                             index: tuple[DataFrame, DataFrame] | None = None,
                             ) -> DataFrame:
    """Incremental dedup: classify every NEW document against an
    EXISTING corpus — the production shape where yesterday's 100 TB is
    already deduped and only today's crawl delta needs checking.

    Per batch doc: ``exact_dup`` (normalized-text fingerprint already in
    the corpus), else ``near_dup`` (n-gram Jaccard ≥ threshold against
    some corpus doc), else ``unique``; ``match_id`` is the smallest
    matching corpus id (-1 for unique). The batch is never compared to
    itself — intra-batch duplicates are the ordinary self-join pass.

    100 TB shape: both probes are equi-joins AGAINST the corpus-side
    index relations (fingerprint set, shingle inverted index) that a
    production pipeline maintains incrementally — the corpus text is
    never re-shingled per batch; here both sides are derived in-query
    so the oracle can replay the math. Every join is pinned
    shuffle-hash (corpus-scaled build sides), and the Jaccard gate is
    integer cross-multiplied (1000·inter ≥ thr‰·union) for
    cross-engine bit-equality.
    """
    thr_m = int(round(threshold * 1000))
    fp_old, sh_old = (index if index is not None
                      else corpus_dedup_index(corpus, text_col, id_col,
                                              ngram))
    fp_new = batch.select(F.col(id_col).alias("doc_id"),
                          fingerprint(text_col).alias("fp"))
    exact = (fp_new.join(fp_old.hint("shuffle_hash"), "fp")
                   .groupBy("doc_id")
                   .agg(F.min("old_id").alias("exact_id")))
    # Set sizes ride ON the shingle rows via a count window over the
    # deduped relation instead of separate size aggregates: the size
    # joins would re-execute the whole scan→shingle→hash pipeline per
    # consumer (measured ~2x the query). The window costs one narrow
    # exchange of 8-byte keyed rows; the gram hashing runs once.
    # deduped + sized in one doc-keyed window pass (interleaved A/B
    # with the distinct-then-window shape: 2.27 -> 1.98 s)
    sh_new = _posting_dedup_sized(
        _doc_shingles(batch, text_col, id_col, ngram)
        .select("doc_id", md5_prefix_hash(F.col("g")).alias("gh")),
        "doc_id", "gh", "na")
    inter = (sh_new.join(sh_old.hint("shuffle_hash"), "gh")
                   .groupBy("doc_id", "old_id")
                   .agg(F.count(F.lit(1)).alias("inter_n"),
                        F.max("na").alias("na"), F.max("nb").alias("nb")))
    near = (inter.where(F.lit(1000) * F.col("inter_n")
                        >= F.lit(thr_m)
                        * (F.col("na") + F.col("nb") - F.col("inter_n")))
                 .groupBy("doc_id")
                 .agg(F.min("old_id").alias("near_id")))
    return (batch.select(F.col(id_col).alias("doc_id"))
                 .join(exact.hint("shuffle_hash"), "doc_id", "left")
                 .join(near.hint("shuffle_hash"), "doc_id", "left")
                 .select("doc_id",
                         F.when(F.col("exact_id").isNotNull(),
                                F.lit("exact_dup"))
                          .when(F.col("near_id").isNotNull(),
                                F.lit("near_dup"))
                          .otherwise(F.lit("unique")).alias("status"),
                         F.coalesce("exact_id", "near_id",
                                    F.lit(-1)).alias("match_id")))


def containment_pairs(df: DataFrame, text_col: str, id_col: str,
                      k: int = 3, w: int = 4, max_df: int = 1000,
                      min_shared: int = 3) -> DataFrame:
    """Substring-level containment candidates via winnowing fingerprints
    (the computation behind the ``substring_containment`` registry
    query, factored out so pipelines can run it over ANY staged
    relation, e.g. the curation funnel's quality survivors).

    Returns (doc_a, doc_b, shared, na, nb, containment_permille):
    pairs sharing ≥ ``min_shared`` fingerprints, scored by
    shared / min(|fps_a|, |fps_b|) in exact integer per-mille.

    100 TB shape (same as the query): fingerprints appearing in
    > ``max_df`` docs are dropped BEFORE the inverted-index self-join
    (boilerplate cap, bounds any bucket's fan-out); the kept relation
    feeds four consumers so it is localCheckpoint-staged once; every
    doc-scaled join is pinned shuffle-hash.
    """
    from ..functions.text import winnow_fingerprints_expr

    fps = (df.withColumn("toks", tokens(F.col(text_col)))
             .select(F.col(id_col).alias("doc_id"),
                     F.explode(F.expr(winnow_fingerprints_expr(
                         "toks", k, w))).alias("fp")))
    # df gate via fp-keyed window (guide §2.4): one exchange of the
    # fingerprint relation instead of aggregate + join-probe
    # re-exchange; (doc_id, fp) rows are distinct per doc (winnowing
    # array_distinct), so count(*) per fp == doc frequency.
    # sizes stay a separate post-stage aggregate + join-backs HERE
    # (unlike verify_pairs_jaccard): carrying n on the posting rows
    # would add a doc-keyed window to the eager checkpoint's critical
    # path, while the three exchanges it removes all run on SMALL
    # post-checkpoint relations (measured +0.14 s fused — §1.1, the
    # ideal-plan-vs-measured rule).
    kept = (fps.withColumn(
                "dfc", F.count(F.lit(1)).over(Window.partitionBy("fp")))
               .where(F.col("dfc") <= max_df)
               .select("doc_id", "fp")
               .localCheckpoint(eager=True))
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = kept.alias("a"), kept.hint("shuffle_hash").alias("b")
    pairs = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("shared"))
              .where(F.col("shared") >= min_shared))
    sa = sizes.withColumnRenamed("doc_id", "doc_a") \
              .withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b") \
              .withColumnRenamed("n", "nb")
    return (pairs.join(sa.hint("shuffle_hash"), "doc_a")
                 .join(sb.hint("shuffle_hash"), "doc_b")
                 .select("doc_a", "doc_b", "shared", "na", "nb",
                         F.expr("1000 * shared div least(na, nb)")
                          .alias("containment_permille")))


class IncrementalDedupIndex:
    """MAINTAINED corpus dedup index — the stateful counterpart of
    ``corpus_dedup_index`` for long-lived consumers (VERDICT r4 item 6):
    classify a delta against the index, then ABSORB the delta's unique
    survivors so later deltas dedup against corpus ∪ every prior batch,
    converging to batch-over-union semantics instead of probing a
    frozen snapshot.

    Both relations re-stage (eager localCheckpoint) after each absorb:
    lineage stays one hop deep no matter how many epochs have merged,
    and each classify probes materialized rows — never a re-execution
    of all prior batches. Index growth is the survivors' fingerprint +
    shingle rows, i.e. exactly the state a production crawler pipeline
    persists between runs; at 100 TB the same shape lives in a table
    the stream MERGEs into instead of executor storage.

    Intra-batch duplicates are deliberately NOT resolved here (same
    contract as ``incremental_dedup_status``): all of a batch's unique
    docs absorb, and the batch self-join pass stays a separate
    operator.
    """

    def __init__(self, corpus: DataFrame, text_col: str, id_col: str,
                 ngram: int = 3):
        self.text_col, self.id_col, self.ngram = text_col, id_col, ngram
        self.fp_old, self.sh_old = corpus_dedup_index(
            corpus, text_col, id_col, ngram, stage=True)

    def classify(self, batch: DataFrame,
                 threshold: float = 0.8) -> DataFrame:
        return incremental_dedup_status(
            None, batch, self.text_col, self.id_col, ngram=self.ngram,
            threshold=threshold, index=(self.fp_old, self.sh_old))

    def absorb(self, survivors: DataFrame) -> None:
        """Merge ``survivors`` (rows of the original document schema —
        the docs classified unique) into both index relations."""
        fp_add = survivors.select(
            F.col(self.id_col).alias("old_id"),
            fingerprint(self.text_col).alias("fp"))
        w = Window.partitionBy("old_id")
        sh_add = (_doc_shingles(survivors, self.text_col, self.id_col,
                                self.ngram)
                  .select(F.col("doc_id").alias("old_id"),
                          md5_prefix_hash(F.col("g")).alias("gh"))
                  .distinct()
                  .withColumn("nb", F.count(F.lit(1)).over(w)))
        self.fp_old = self.fp_old.unionByName(fp_add) \
                                 .localCheckpoint(eager=True)
        self.sh_old = self.sh_old.unionByName(sh_add) \
                                 .localCheckpoint(eager=True)
