package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Curate

/** Dataset-curation operators as driver-checkable queries. Every
  * decision is a function of the portable 48-bit hash, so the DuckDB
  * oracle replays the identical sampling / split / packing rule — the
  * reproducible-data-recipe property these operators exist for.
  */
object CurateQueries {

  private type Q = (SparkSession, String) => DataFrame

  private val H48 =
    "('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,12))::BIGINT"

  // ---------------------------------------------------------------- q47
  /** Stratified downsampling: 50% of English documents, 10% of every
    * other language, keyed on doc_id's hash — map-only, rerun-stable.
    */
  val q47: Q = (s, dir) =>
    Curate.stratifiedSample(
        Tables.documents(s, dir),
        col("doc_id"),
        when(col("lang") === "en", 50).otherwise(10))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  val q47Sql: String =
    s"""SELECT doc_id, lang FROM documents
       |WHERE $H48 % 100 < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Deterministic 80/10/10 train/val/test assignment by key hash. */
  val q48: Q = (s, dir) =>
    Curate.hashSplit(Tables.documents(s, dir), col("doc_id"),
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("doc_id", "split")
      .orderBy("doc_id")
  val q48Sql: String =
    s"""SELECT doc_id,
       |  CASE WHEN $H48 % 100 < 80 THEN 'train'
       |       WHEN $H48 % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Sequence packing into 2048-token bins over 8 hash shards (the
    * concat-then-chunk context-window layout; see Curate.packSequences).
    */
  val q49: Q = (s, dir) =>
    Curate.packSequences(
        Tables.documents(s, dir), "doc_id",
        size(graft.functions.Portable.tokens(col("text"))),
        capacity = 2048L, shards = 8)
      .orderBy("doc_id")
  val q49Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tok,
       |    $H48 % 8 AS shard
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, shard, n_tok,
       |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) - n_tok
       |      AS BIGINT) AS cum_before
       |  FROM t)
       |SELECT doc_id, shard,
       |  CAST(shard * 1000000 + cum_before // 2048 AS BIGINT) AS bin,
       |  CAST(cum_before % 2048 AS BIGINT) AS bin_offset, n_tok
       |FROM c ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q158
  /** Packing-utilization report ([[Curate.packingReport]]) over q49's
    * 2048-token × 8-shard packing: bins histogrammed by fill decile
    * (clamped 10 bucket = at-or-over capacity, which boundary-
    * straddling documents legitimately produce) with document and
    * token totals — the context-window waste report. Two map-side-
    * combined hash aggregates; the oracle extends q49's replay with
    * the same two GROUP BYs.
    */
  val q158: Q = (s, dir) =>
    Curate.packingReport(
      Curate.packSequences(
        graft.Tables.documents(s, dir), "doc_id",
        size(graft.functions.Portable.tokens(col("text"))),
        capacity = 2048L, shards = 8),
      capacity = 2048L)
      .orderBy("util_decile")
  val q158Sql: String = {
    val marker = "SELECT doc_id, shard,"
    require(q49Sql.contains(marker), "q158 oracle derives from q49's replay")
    q49Sql.substring(0, q49Sql.lastIndexOf(marker)).trim + ",\n" +
      """p AS (SELECT
        |    CAST(shard * 1000000 + cum_before // 2048 AS BIGINT) AS bin,
        |    n_tok FROM c),
        |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS fill FROM p GROUP BY bin)
        |SELECT CAST(least(10, (fill * 10) // 2048) AS BIGINT)
        |    AS util_decile,
        |  CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(fill) AS BIGINT) AS total_tokens
        |FROM b GROUP BY 1 ORDER BY util_decile""".stripMargin
  }

  // ---------------------------------------------------------------- q51
  /** Train/eval decontamination: on a corpus with planted duplicates
    * (every 10th doc copied under a new id), split 80/20 by key hash,
    * then surface every eval document whose exact content fingerprint
    * also appears in the train split — the leakage check an LLM data
    * pipeline runs before training. One fingerprint hash-join; no
    * all-pairs anything.
    */
  val q51: Q = (s, dir) => {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val fp = Curate.hashSplit(corpus, col("doc_id"),
        Seq(("train", 80), ("eval", 20)))
      .select(col("doc_id"), col("split"),
        md5(col("text").cast("binary")).as("fp"))
    val train = fp.filter(col("split") === "train")
      .select(col("fp"), col("doc_id").as("train_id"))
    fp.filter(col("split") === "eval")
      .select(col("fp"), col("doc_id").as("eval_id"))
      .join(train, "fp")
      .groupBy("eval_id")
      .agg(min(col("train_id")).as("matched_train_id"),
        count(lit(1)).as("n_matches"))
      .orderBy("eval_id")
  }
  val q51Sql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id+1000000, text FROM documents WHERE doc_id%10=0),
       |f AS (SELECT doc_id, md5(text) AS fp,
       |    CASE WHEN $H48 % 100 < 80 THEN 'train' ELSE 'eval' END AS split
       |  FROM corpus)
       |SELECT e.doc_id AS eval_id,
       |  min(t.doc_id) AS matched_train_id, count(*) AS n_matches
       |FROM f e JOIN f t ON e.fp = t.fp AND e.split = 'eval' AND t.split = 'train'
       |GROUP BY 1 ORDER BY eval_id""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Exact per-language quota sample (25 docs per lang, smallest key
    * hashes win) via the bounded top-k aggregator — no per-stratum
    * window sort; partial aggregation ships ≤ quota rows per partition.
    */
  val q53: Q = (s, dir) =>
    Curate.quotaSample(Tables.documents(s, dir), Seq("lang"),
        col("doc_id"), 25)
      .withColumnRenamed("id", "doc_id")
      .orderBy("lang", "doc_id")
  val q53Sql: String =
    s"""SELECT lang, doc_id FROM (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY $H48, doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 25 ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Bloom-filter decontamination ([[graft.operators.Bloom]]): the eval
    * set (doc_id ≡ 0 mod 53) builds a 2¹⁸-bit filter over content md5s;
    * the rest of the corpus is screened map-only against the broadcast
    * bits. Complements q51's exact fingerprint join: the join moves the
    * corpus fingerprints through a shuffle, the filter moves 32 KB of
    * bits to the corpus — the 100 TB screening shape. The oracle replays
    * membership as position-set containment (bool_and over the same
    * hash48-derived positions), which is bit-for-bit the same predicate —
    * false positives included.
    */
  val q60: Q = (s, dir) => {
    val k = 5; val bits = 262144
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("v"))
    val eval = docs.filter(col("doc_id") % 53 === 0)
    val corpus = docs.filter(col("doc_id") % 53 =!= 0)
    val bloom = graft.operators.Bloom.build(eval, col("v"), k, bits)
    corpus.crossJoin(broadcast(bloom))
      .select(col("doc_id"),
        graft.operators.Bloom.mightContain(col("bloom"), col("v"), k, bits)
          .as("contaminated"))
      .orderBy("doc_id")
  }
  val q60Sql: String = {
    val pos = (v: String) =>
      s"('0x'||substr(md5($v || '#' || CAST(i AS VARCHAR)),1,12))::BIGINT % 262144"
    s"""WITH ks AS (SELECT unnest([0,1,2,3,4]) AS i),
       |ev AS (SELECT md5(text) AS v FROM documents WHERE doc_id % 53 = 0),
       |evpos AS (SELECT DISTINCT ${pos("v")} AS pos FROM ev CROSS JOIN ks),
       |corpus AS (SELECT doc_id, md5(text) AS v FROM documents
       |           WHERE doc_id % 53 <> 0),
       |cp AS (SELECT doc_id, ${pos("v")} AS pos FROM corpus CROSS JOIN ks)
       |SELECT doc_id,
       |  bool_and(pos IN (SELECT pos FROM evpos)) AS contaminated
       |FROM cp GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q106
  /** Per-source ADAPTIVE quality gate ([[Curate.adaptiveQualityGate]]):
    * drop each source's worst 25% by integer quality score (scaled
    * alphabetic fraction, 10⁴·n_alpha div n_chars) instead of one
    * corpus-wide cutoff — a fixed threshold over-prunes clean sources
    * and under-prunes noisy ones. The threshold is the exact lower
    * 25th percentile per source (integer cross-multiplied membership,
    * q93's test), computed on the (source, score) value domain and
    * broadcast back into a map-only filter — the relative-quality
    * curation shape for a multi-source 100 TB corpus.
    */
  val q106: Q = (s, dir) => {
    val alphabet = ('a' to 'z').mkString + ('A' to 'Z').mkString
    val scored = Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      expr(s"(10000 * (length(text) - " +
        s"length(translate(text, '$alphabet', '')))) div length(text)")
        .as("score"))
    Curate.adaptiveQualityGate(scored, Seq("source"), col("score"), p = 25)
      .select("doc_id", "source", "score", "thr")
      .orderBy("doc_id")
  }
  val q106Sql: String =
    """WITH s AS (SELECT doc_id, source,
      |    CAST((10000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
      |      // length(text) AS BIGINT) AS score
      |  FROM documents),
      |c AS (SELECT source, score, count(*) AS n FROM s GROUP BY 1, 2),
      |w AS (SELECT source, score,
      |    sum(n) OVER (PARTITION BY source ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(n) OVER (PARTITION BY source) AS tot
      |  FROM c),
      |t AS (SELECT source,
      |    CAST(min(CASE WHEN cum * 100 >= tot * 25 THEN score END) AS BIGINT)
      |      AS thr
      |  FROM w GROUP BY 1)
      |SELECT s.doc_id, s.source, s.score, t.thr
      |FROM s JOIN t USING (source) WHERE s.score >= t.thr
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q110
  /** Mixture materialization ([[Curate.mixToBudget]]): the data recipe
    * {src0:1, src1:1, src2:8} at a 100-document budget, made concrete as
    * per-document copy counts — src0/src1 downsample to 10 docs each,
    * src2 epoch-upsamples to Σcopies = 80 exactly. Ranking is the
    * two-level shard trick (parallel intra-shard windows + broadcast
    * count offsets), never a per-source global sort; the oracle replays
    * the identical (shard, hash, id) order with one ROW_NUMBER.
    */
  val q110: Q = (s, dir) =>
    Curate.mixToBudget(Tables.documents(s, dir), "source", col("doc_id"),
        weights = Seq("src0" -> 1L, "src1" -> 1L, "src2" -> 8L),
        budget = 100L, shards = 64)
      .orderBy("source", "doc_id")
  val q110Sql: String =
    """WITH w(source, wt) AS (VALUES ('src0', CAST(1 AS BIGINT)),
      |    ('src1', CAST(1 AS BIGINT)), ('src2', CAST(8 AS BIGINT))),
      |t AS (SELECT source, (wt * 100) // 10 AS target FROM w),
      |d AS (SELECT source, doc_id AS id,
      |        ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,12))::BIGINT AS h
      |      FROM documents),
      |r AS (SELECT source, id, h,
      |        CAST(row_number() OVER (PARTITION BY source
      |          ORDER BY h % 64, h, id) AS BIGINT) AS rnk,
      |        count(*) OVER (PARTITION BY source) AS avail
      |      FROM d),
      |c AS (SELECT r.source, r.id, (t.target // r.avail) +
      |        CASE WHEN r.rnk <= t.target % r.avail THEN 1 ELSE 0 END AS copies
      |      FROM r JOIN t USING (source))
      |SELECT source, id AS doc_id, copies FROM c WHERE copies >= 1
      |ORDER BY source, doc_id""".stripMargin

  // --------------------------------------------------------------- q115
  /** Leakage-aware split ([[Curate.leakageAwareSplit]]) over the
    * duplicated-corpus fixture: exact-fingerprint pairs → connected
    * components → every member splits by its REPRESENTATIVE's hash, so
    * a dup cluster can never straddle train/test. The oracle replays
    * components with a recursive CTE and the split rule on the rep.
    */
  val q115: Q = (s, dir) => {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val fp = corpus.select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val pairs = fp.as("a").join(fp.as("b"), "fp")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    Curate.leakageAwareSplit(corpus, col("doc_id"), pairs,
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("doc_id", "rep", "split")
      .orderBy("doc_id")
  }
  val q115Sql: String =
    """WITH RECURSIVE corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id+1000000, text FROM documents WHERE doc_id%20=0
      |  UNION ALL SELECT doc_id+2000000, text FROM documents WHERE doc_id%20=0),
      |fp AS (SELECT doc_id, md5(text) AS fp FROM corpus),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS comp
      |  FROM reach GROUP BY src),
      |rep AS (SELECT c.doc_id, coalesce(k.comp, c.doc_id) AS rep
      |  FROM corpus c LEFT JOIN comp k ON k.doc_id = c.doc_id)
      |SELECT doc_id, rep,
      |  CASE WHEN ('0x'||substr(md5(CAST(rep AS VARCHAR)),1,12))::BIGINT % 100 < 80 THEN 'train'
      |       WHEN ('0x'||substr(md5(CAST(rep AS VARCHAR)),1,12))::BIGINT % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM rep ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q142
  /** Temperature-balanced quotas ([[Curate.sqrtBalancedQuota]]): a
    * 200-doc budget split across languages by ⌊√n⌋ weights (T=2 — the
    * UniMax-style head/tail compromise), members kept by smallest key
    * hash. IEEE sqrt is correctly rounded by the standard, so even the
    * "transcendental" here replays exactly.
    */
  val q142: Q = (s, dir) =>
    Curate.sqrtBalancedQuota(Tables.documents(s, dir), Seq("lang"),
        col("doc_id"), budget = 200L)
      .withColumnRenamed("id", "doc_id")
      .orderBy("lang", "doc_id")
  val q142Sql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n,
       |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
       |  FROM documents GROUP BY lang),
       |t AS (SELECT sum(w) AS sw FROM c),
       |q AS (SELECT lang, n, (200 * w) // sw AS quota FROM c CROSS JOIN t),
       |r AS (SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY $H48, doc_id) AS rk
       |  FROM documents)
       |SELECT r.lang, r.doc_id, CAST(q.quota AS BIGINT) AS quota, q.n
       |FROM r JOIN q USING (lang) WHERE r.rk <= q.quota
       |ORDER BY lang, doc_id""".stripMargin

  // --------------------------------------------------------------- q130
  /** Deterministic epoch shuffle ([[Curate.epochShuffle]]): two
    * independent pseudorandom permutations of the corpus, sharded 4-way
    * for parallel readers — the reproducible training-order primitive.
    * Pure hashing, so the oracle replays every (epoch, shard, pos)
    * coordinate exactly.
    */
  val q130: Q = (s, dir) =>
    Curate.epochShuffle(Tables.documents(s, dir), col("doc_id"),
        epochs = 2, shards = 4)
      .withColumn("doc_id", col("k").cast("long"))
      .select("epoch", "shard", "pos", "doc_id")
      .orderBy("epoch", "shard", "pos")
  val q130Sql: String =
    """WITH e AS (SELECT doc_id, unnest(range(2)) AS epoch FROM documents),
      |h AS (SELECT epoch, doc_id,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'#e'||CAST(epoch AS VARCHAR)),1,12))::BIGINT AS hv
      |  FROM e)
      |SELECT CAST(epoch AS BIGINT) AS epoch, hv % 4 AS shard,
      |  CAST(row_number() OVER (PARTITION BY epoch, hv % 4
      |    ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos,
      |  doc_id
      |FROM h ORDER BY epoch, shard, pos""".stripMargin

  // --------------------------------------------------------------- q126
  /** Token-budget trim ([[Curate.budgetTrim]]): fill a fixed 10k-token
    * budget with the most alpha-dense documents — the "spend the crawl
    * budget on the best docs" selection, decomposed so no global sort
    * ever runs: bucket totals + broadcast prefix + per-bucket windows.
    * The oracle replays the equivalent GLOBAL running-sum rule, so
    * agreement proves the decomposition exact, tiebreaks included.
    */
  val q126: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
      .select(col("doc_id") +: graft.operators.TextOps.quality(col("text")): _*)
      .filter(col("n_chars_m") > 0)
      .withColumn("pri", expr("(n_alpha * 1000) div n_chars_m"))
      .withColumn("cost", col("n_tokens"))
    Curate.budgetTrim(d, col("doc_id"), col("pri"), col("cost"),
        budget = 10000L)
      .select(col("doc_id"), col("pri"), col("cost"), col("cost_before"))
      .orderBy("doc_id")
  }
  val q126Sql: String =
    """WITH x AS (SELECT doc_id,
      |    len(string_split_regex(text, '\s+')) AS cost,
      |    length(text) AS n_chars,
      |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
      |  FROM documents WHERE length(text) > 0),
      |p AS (SELECT doc_id, (n_alpha*1000)//n_chars AS pri, cost FROM x),
      |w AS (SELECT doc_id, pri, cost,
      |    coalesce(sum(cost) OVER (ORDER BY pri DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cost_before
      |  FROM p)
      |SELECT doc_id, pri, cost, CAST(cost_before AS BIGINT) AS cost_before
      |FROM w
      |WHERE cost_before < 10000 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q155
  /** Per-document drop audit ([[Curate.dropAudit]]): every document's
    * verdict — pass, or the FIRST curation gate (quality / exact_dup /
    * contaminated) that removes it — computed with all gate flags in a
    * single corpus scan plus one fingerprint-keyed aggregate and one
    * broadcast benchmark join; the "why was my document dropped"
    * debugging surface. The doc_id % 97 slice doubles as a benchmark
    * planted INSIDE the corpus, so the contamination gate provably
    * fires. Oracle replays gopher rules (q101), the canonical-owner
    * rule (q20), and the fingerprint semi-join (q51) in one CASE.
    */
  val q155: Q = (s, dir) => {
    val d = graft.Tables.documents(s, dir)
    val bench = d.filter(col("doc_id") % 97 === 0).select("text")
    Curate.dropAudit(d, "doc_id", "text", bench, minGopher = 4)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }
  val q155Sql: String =
    """WITH g AS (
      |  SELECT doc_id, md5(text) AS fp,
      |    CAST((CASE WHEN len(w) BETWEEN 10 AND 5000 THEN 1 ELSE 0 END) +
      |      (CASE WHEN wc >= len(w)*3 AND wc <= len(w)*10 THEN 1 ELSE 0 END) +
      |      (CASE WHEN na*5 >= len(w)*4 THEN 1 ELSE 0 END) +
      |      (CASE WHEN ns >= 2 THEN 1 ELSE 0 END) +
      |      (CASE WHEN nd*10 <= len(w) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS gopher_score
      |  FROM (
      |    SELECT doc_id, text, w,
      |      list_reduce(list_transform(w, t -> length(t)), (a,b) -> a+b) AS wc,
      |      len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS na,
      |      len(list_filter(w, t -> regexp_matches(t, '^[0-9]+$'))) AS nd,
      |      len(list_intersect(list_distinct(w),
      |        ['the','a','of','and','to','in'])) AS ns
      |    FROM (SELECT doc_id, text,
      |            string_split_regex(lower(text), '\s+') AS w
      |          FROM documents))),
      |o AS (SELECT fp, min(doc_id) AS owner_id FROM g GROUP BY fp),
      |b AS (SELECT DISTINCT md5(text) AS fp FROM documents
      |      WHERE doc_id % 97 = 0)
      |SELECT g.doc_id, g.gopher_score,
      |  CASE WHEN g.gopher_score < 4 THEN 'quality'
      |       WHEN g.doc_id != o.owner_id THEN 'exact_dup'
      |       WHEN b.fp IS NOT NULL THEN 'contaminated'
      |       ELSE 'pass' END AS verdict
      |FROM g JOIN o USING (fp) LEFT JOIN b USING (fp)
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q155_drop_audit" -> q155,
    "q158_packing_report" -> q158,
    "q126_budget_trim" -> q126,
    "q130_epoch_shuffle" -> q130,
    "q142_sqrt_balanced_quota" -> q142,
    "q47_stratified_sample" -> q47,
    "q110_mix_to_budget" -> q110,
    "q115_leakage_aware_split" -> q115,
    "q48_hash_split" -> q48,
    "q49_pack_sequences" -> q49,
    "q51_decontaminate" -> q51,
    "q53_quota_sample" -> q53,
    "q60_bloom_decontaminate" -> q60,
    "q106_adaptive_quality" -> q106)

  val oracle: Map[String, String] = Map(
    "q155_drop_audit" -> q155Sql,
    "q158_packing_report" -> q158Sql,
    "q126_budget_trim" -> q126Sql,
    "q130_epoch_shuffle" -> q130Sql,
    "q142_sqrt_balanced_quota" -> q142Sql,
    "q47_stratified_sample" -> q47Sql,
    "q110_mix_to_budget" -> q110Sql,
    "q115_leakage_aware_split" -> q115Sql,
    "q48_hash_split" -> q48Sql,
    "q49_pack_sequences" -> q49Sql,
    "q51_decontaminate" -> q51Sql,
    "q53_quota_sample" -> q53Sql,
    "q60_bloom_decontaminate" -> q60Sql,
    "q106_adaptive_quality" -> q106Sql)
}
