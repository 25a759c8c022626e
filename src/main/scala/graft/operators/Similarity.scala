package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Similarity search over embedding columns (`array<float>`).
  *
  * Numeric determinism: vectors are quantized to exact integers (×1000,
  * rounded) so dot products are exact Long sums — immune to float
  * summation order across partitions/engines. Cosine is then a scalar
  * double expression over exact integers.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set and scans the
  *    base once — a map-only stage plus a per-query top-k
  *    (TakeOrdered-style, no global sort);
  *  - the LSH variant buckets base and queries by random-hyperplane
  *    signature; the join is then bucket-equi (shuffle on bucket id, or
  *    broadcast when the query side is small) and each query scores only
  *    its bucket — the standard recall/cost trade controlled by the
  *    number of planes. An IVF variant would swap the signature for a
  *    learned coarse quantizer; the plumbing is identical.
  */
object Similarity {

  // Base frames pass through Spread.ensure(_, idCol): a single-row-group
  // parquet base would otherwise run every quantize/dot map stage on one
  // core, and the id-hash partitioning is exactly what the downstream
  // per-id aggregations reuse. No-op on already-wide inputs.

  val Scale = 1000

  /** Quantized vector + its exact squared norm. */
  def quantized(vec: Column): (Column, Column) = {
    val q = Portable.quantize(vec, Scale)
    (q, Portable.dotQ(q, q))
  }

  /** Brute-force cosine top-k: for each query row, the k nearest base
    * rows (self excluded) by quantized cosine, deterministic tiebreak on
    * neighbor id. Output: (query_id, neighbor_id, rank, cos).
    */
  def cosineTopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, digits: Int = 6): DataFrame =
    rankedCosine(base, queries, idCol, vecCol, k, digits, labelCol = None)
      .select("query_id", "neighbor_id", "rank", "cos")

  /** Hard-negative mining for contrastive training: for each anchor
    * (query) row, the k MOST similar base rows carrying a DIFFERENT
    * label — the near-the-margin negatives that make embedding training
    * converge, as opposed to uniformly sampled easy ones. Identical
    * plan shape to [[cosineTopK]] (broadcast anchors, map-only scoring,
    * per-anchor bounded top-k); the label inequality prunes BEFORE
    * ranking, so rank is over negatives only.
    * Output: (query_id, query_label, neighbor_id, neighbor_label,
    * rank, cos).
    */
  def hardNegatives(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, digits: Int = 6): DataFrame =
    rankedCosine(base, queries, idCol, vecCol, k, digits, Some(labelCol))

  /** Shared broadcast-queries exact-cosine ranking core. With a label
    * column, pairs sharing a label are excluded (negative mining);
    * without, only self-pairs are.
    */
  private def rankedCosine(base: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, digits: Int,
      labelCol: Option[String]): DataFrame = {
    val (bq, bn) = quantized(col(vecCol))
    def side(df: DataFrame, role: String) = {
      val named = df.select(
        col(idCol).as(s"${role}_id") +: labelCol.toSeq.map(l =>
          col(l).as(s"${role}_label")) :+ bq.as(s"${role.head}_q") :+
          bn.as(s"${role.head}_n"): _*)
      named
    }
    val b = side(Spread.ensure(base, idCol), "neighbor")
    val q = side(queries, "query")
    val keep = labelCol match {
      case Some(_) => col("neighbor_label") =!= col("query_label")
      case None    => col("neighbor_id") =!= col("query_id")
    }
    val scored = b.crossJoin(broadcast(q))
      .filter(keep)
      .withColumn("cos", Portable.cosineQ(
        Portable.dotQ(col("q_q"), col("n_q")), col("q_n"), col("n_n"), digits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .drop("q_q", "q_n", "n_q", "n_n")
  }

  /** SQ8 coding shared by [[sq8TopK]]/[[sq8Recall]]/[[sq8Rerank]]: each
    * dimension of the (already ×1000-integer-quantized) corpus is
    * linearly mapped to an 8-bit code via the per-dimension [lo, hi]
    * range observed on the BASE corpus — 4 bytes/dim → 1 byte/dim, the
    * standard memory-scale path (FAISS SQ8) that keeps scoring a plain
    * integer dot product (vs PQ's codebook lookups; q55). Queries must
    * come from the base's value envelope (here: typically a base
    * subset), keeping codes in [0, 255].
    *
    * The per-dim envelope is one agg to `dims` rows (collected — the
    * bounded-collect pattern, dimensionality-scale never corpus-scale);
    * coding is a map-only projection. Integer end-to-end: the code
    * mapping is `((x − lo)·255) div span` on exact longs, so any engine
    * reproduces identical codes and ranks.
    *
    * Returns (codedBase(neighbor_id, code), codedQueries(query_id,
    * qcode)).
    */
  private def sq8Coded(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String): (DataFrame, DataFrame) = {
    val q = Portable.quantize(col(vecCol), Scale)
    val b = Spread.ensure(base, idCol)
      .select(col(idCol).as("neighbor_id"), q.as("bq"))
    val qs = queries.select(col(idCol).as("query_id"), q.as("qq"))
    val env = b.select(posexplode(col("bq")).as(Seq("d", "x")))
      .groupBy("d")
      .agg(min("x").as("lo"), greatest(max("x") - min("x"), lit(1L)).as("span"))
      .orderBy("d").collect()
    val loArr = array(env.map(r => lit(r.getLong(1))): _*)
    val spanArr = array(env.map(r => lit(r.getLong(2))): _*)
    def coded(df: DataFrame, vc: String) = df
      .withColumn("__lo", loArr).withColumn("__span", spanArr)
      .withColumn("code",
        expr(s"transform($vc, (x, i) -> ((x - __lo[i]) * 255) div __span[i])"))
      .drop("__lo", "__span", vc)
    (coded(b, "bq"),
      coded(qs, "qq").withColumnRenamed("code", "qcode"))
  }

  /** SQ8 approximate top-k: integer dot product over the 8-bit codes,
    * [[cosineTopK]] plan shape (broadcast queries, map-only scoring,
    * bounded per-query top-k). Output: (query_id, neighbor_id, rank,
    * dot).
    */
  def sq8TopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val (cb, cq) = sq8Coded(base, queries, idCol, vecCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id"))
    cb.crossJoin(broadcast(cq))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", Portable.dotQ(col("qcode"), col("code")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "dot")
  }

  /** SQ8 recall audit — the report a deployment reads before switching
    * the fleet to compressed vectors: per query, how many of the exact
    * cosine top-k the SQ8 top-k retains (`n_hit`, `recall_pct`).
    */
  def sq8Recall(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val approxTop = sq8TopK(base, queries, idCol, vecCol, k)
      .select("query_id", "neighbor_id")
    val exactTop = cosineTopK(base, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id").as("exact_id"))
    approxTop.join(exactTop,
        approxTop("query_id") === exactTop("query_id") &&
          approxTop("neighbor_id") === exactTop("exact_id"), "left")
      .groupBy(approxTop("query_id"))
      .agg(count(col("exact_id")).as("n_hit"))
      .withColumn("recall_pct", expr(s"(100 * n_hit) div $k"))
  }

  /** Two-stage retrieve-then-rerank — the production ANN serving shape:
    * a cheap SQ8 integer-dot screen nominates `screenK` candidates per
    * query (compressed codes, 4× less memory traffic than the raw
    * vectors), then ONLY those candidates are re-scored with the exact
    * quantized cosine and the top `k` kept. At 100 TB the screen is the
    * full-corpus scan and the rerank touches `screenK` rows per query —
    * the full-precision vectors are fetched for ~0.1% of the corpus
    * instead of all of it.
    *
    * Output: (query_id, neighbor_id, rank, cos) — q24's shape, so the
    * recall loss of a given (screenK, k) setting is directly visible
    * against the exact ranking.
    */
  /** Matryoshka prefix-dimension recall audit — the report read before
    * truncating an MRL-trained embedding fleet to its first `dims`
    * coordinates (half the storage and memory traffic of every ANN
    * structure built on it): per query, how many of the full-dimension
    * exact top-k survive when ranking uses only the prefix. The
    * [[sq8Recall]] pattern with the approximation axis changed from
    * PRECISION (8-bit codes) to DIMENSIONALITY (prefix slice) — both
    * rankings run the same broadcast-queries map-only scan.
    *
    * Output: (query_id, n_hit, recall_pct), recall_pct integral.
    */
  def matryoshkaRecall(base: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dims: Int, k: Int): DataFrame = {
    require(dims >= 1, s"dims: $dims")
    def sliced(df: DataFrame): DataFrame =
      df.withColumn(vecCol, slice(col(vecCol), 1, dims))
    val prefixTop = cosineTopK(sliced(base), sliced(queries), idCol,
        vecCol, k)
      .select("query_id", "neighbor_id")
    val exactTop = cosineTopK(base, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id").as("exact_id"))
    prefixTop.join(exactTop,
        prefixTop("query_id") === exactTop("query_id") &&
          prefixTop("neighbor_id") === exactTop("exact_id"), "left")
      .groupBy(prefixTop("query_id"))
      .agg(count(col("exact_id")).as("n_hit"))
      .withColumn("recall_pct", expr(s"(100 * n_hit) div $k"))
  }

  def sq8Rerank(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, screenK: Int, digits: Int = 6): DataFrame = {
    require(screenK >= k, s"screenK ($screenK) must be ≥ k ($k)")
    val cand = sq8TopK(base, queries, idCol, vecCol, screenK)
      .select("query_id", "neighbor_id")
    val (bq, bn) = quantized(col(vecCol))
    def side(df: DataFrame, role: String) = df.select(
      col(idCol).as(s"${role}_id"), bq.as(s"${role.head}_q"), bn.as(s"${role.head}_n"))
    val rescored = cand
      .join(side(Spread.ensure(base, idCol), "neighbor"), Seq("neighbor_id"))
      .join(broadcast(side(queries, "query")), Seq("query_id"))
      .withColumn("cos", Portable.cosineQ(
        Portable.dotQ(col("q_q"), col("n_q")), col("q_n"), col("n_n"), digits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Label-noise screening by neighborhood voting (confident-learning
    * lite): for each query row, the fraction of its k exact-cosine
    * nearest neighbors carrying a DIFFERENT label — rows whose
    * neighborhoods outvote their own label are the mislabeled-candidate
    * review queue. The audit shape is a FIXED query batch against the
    * full corpus (a reviewer's slice, a fresh annotation delta), so the
    * scan is corpus-linear however large the base grows; auditing an
    * entire 100 TB corpus at once composes this scorer with an ANN
    * screen ([[sq8Rerank]], q107's IVF index) instead of the exact scan.
    *
    * Output: (query_id, query_label, n_diff, disagree_pct), integer
    * end-to-end.
    */
  def labelNoise(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nbrs = cosineTopK(base, queries, idCol, vecCol, k)
    val labels = base.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"))
    val qLabels = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"))
    nbrs.join(labels, Seq("neighbor_id"))
      .join(broadcast(qLabels), Seq("query_id"))
      .groupBy("query_id", "query_label")
      .agg(sum(when(col("neighbor_label") =!= col("query_label"), 1L)
        .otherwise(0L)).as("n_diff"))
      .withColumn("disagree_pct", expr(s"(100 * n_diff) div $k"))
  }

  /** Embedding near-duplicate pairs (cos ≥ minCos). With `blockCol` the
    * pair generation joins on the blocking key (label, coarse cluster,
    * LSH bucket, …) — the practical path at scale; without it, brute
    * all-pairs, which is GUARDED: a caller must either stay under
    * `bruteForceCeiling` rows (checked with one count before the join)
    * or pass `allowBruteForce = true` explicitly, so nobody goes
    * quadratic by accident where [[nearDupPairsLsh]]/[[semDeDup]] were
    * the intended path.
    *
    * Choose a blocking key whose CARDINALITY grows with the corpus:
    * with a fixed-cardinality key (e.g. a 16-value label) block sizes
    * grow linearly and pair candidates quadratically — the round-10
    * scale run measured 12.6× time at 10× data for the label-blocked
    * fixture vs 2.1× for the LSH-blocked twin (docs/SCALE.md).
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, blockCol: Option[String] = None,
      digits: Int = 6, allowBruteForce: Boolean = false,
      bruteForceCeiling: Long = 100000L): DataFrame = {
    val (qv, qn) = quantized(col(vecCol))
    val s = Spread.ensure(df, idCol)
      .select(Seq(col(idCol).as("id"), qv.as("q"), qn.as("n")) ++
      blockCol.map(c => col(c).as("block")): _*)
    val paired = blockCol match {
      case Some(_) => s.as("a").join(s.as("b"),
        col("a.block") === col("b.block"))
      case None =>
        if (!allowBruteForce) {
          val n = df.count()
          require(n <= bruteForceCeiling,
            s"nearDupPairs without a blocking column is all-pairs " +
              s"(O(n²)): $n rows exceeds the $bruteForceCeiling-row " +
              "brute-force ceiling. Pass a blockCol, use " +
              "nearDupPairsLsh/semDeDup, or opt in with " +
              "allowBruteForce = true.")
        }
        s.as("a").crossJoin(s.as("b"))
    }
    paired
      .filter(col("a.id") < col("b.id"))
      .withColumn("cos", Portable.cosineQ(
        Portable.dotQ(col("a.q"), col("b.q")), col("a.n"), col("b.n"), digits))
      .filter(col("cos") >= minCos)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** Embedding near-dup pairs blocked by random-hyperplane LSH bucket —
    * the no-label scale path: vectors with cos ≥ minCos almost surely
    * agree on every plane sign, so true near-dups land in the same
    * bucket and the pair join is bucket-equi instead of all-pairs.
    * Deterministic planes ⇒ exactly replayable by the SQL oracle.
    */
  def nearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, planes: Int = 8, dim: Int = 64,
      digits: Int = 6): DataFrame = {
    val withBlock = df.withColumn("_rhp_block",
      rhpBucket(Portable.quantize(col(vecCol), Scale), planeMatrix(planes, dim)))
    nearDupPairs(withBlock, idCol, vecCol, minCos, Some("_rhp_block"), digits)
  }

  /** Deterministic ±1 random-hyperplane matrix (planes × dim), derived
    * from md5 so any engine/replica regenerates the identical planes.
    */
  def planeMatrix(planes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(planes, dim) { (p, d) =>
      val h = MessageDigest.getInstance("MD5")
        .digest(s"plane_${p}_$d".getBytes(StandardCharsets.UTF_8))
      if ((h(0) & 1) == 0) 1 else -1
    }

  /** Random-hyperplane LSH bucket id: bit p = sign of ⟨v, plane_p⟩. */
  def rhpBucket(qvec: Column, planes: Array[Array[Int]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val dot = Portable.dotQ(qvec, typedLit(plane.map(_.toLong).toSeq))
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact Gram matrix Xᵀ X of the quantized embedding column — the
    * reduce step of distributed PCA/covariance: one pass, one shuffle of
    * d·(d+1)/2-keyed partial sums, a d×d result no matter the corpus
    * size. Per row, the upper-triangle outer product explodes to 2080
    * (d=64) exact-Long cell terms that partial-aggregate map-side, so
    * the exchange carries ≤ cells × partitions rows. Consumers center
    * with the companion column sums (`s_i`, from the same pass shape)
    * and run the d×d eigen step wherever they like — the driver, at
    * these sizes. All arithmetic exact Long: any engine replays the
    * identical matrix.
    * Output: (i, j, s_xy) for 0 ≤ i ≤ j < d.
    */
  def gramMatrix(df: DataFrame, vecCol: String, scale: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Per-partition accumulator instead of the equivalent per-row
    // upper-triangle explode → hash aggregate: the explode materializes
    // rows × 2080 structs through Generate and probes the agg hash map
    // once per cell term, which measured 3.2 s warm at sf0.1 — all
    // overhead, no arithmetic. Here each task folds its rows into ONE
    // d(d+1)/2 Long array (250M JIT'd multiply-adds run at memory
    // bandwidth) and emits 2080 partial rows per PARTITION; the final
    // aggregate touches partitions × 2080 rows. This is the documented
    // legitimate mapPartitions case — per-partition imperative state no
    // Column expression can hold. Identical exact-Long arithmetic, so
    // the oracle (and the q127 PCA consumers) see the same matrix.
    df.select(expr(s"transform($vecCol, x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * ${scale}.0d + 0.5d) AS BIGINT))")
        .as("v"))
      .as[Array[Long]]
      .mapPartitions { it =>
        var acc: Array[Long] = null
        var d = 0
        it.foreach { v =>
          if (acc == null) { d = v.length; acc = new Array[Long](d * (d + 1) / 2) }
          require(v.length == d, s"mixed vector dims: ${v.length} vs $d")
          var idx = 0
          var i = 0
          while (i < d) {
            val vi = v(i)
            var j = i
            while (j < d) { acc(idx) += vi * v(j); idx += 1; j += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else {
          var idx = 0
          (0 until d).iterator.flatMap { i =>
            (i until d).iterator.map { j =>
              val t = (i.toLong, j.toLong, acc(idx)); idx += 1; t
            }
          }
        }
      }
      .toDF("i", "j", "s_xy")
      .groupBy("i", "j").agg(sum(col("s_xy")).as("s_xy"))
  }

  /** Johnson–Lindenstrauss random projection: each quantized vector is
    * reduced to `k` exact-Long coordinates ⟨v, plane_p⟩ against the
    * md5-derived ±1 plane family ([[planeMatrix]]) — the Achlioptas
    * sign-matrix construction, which preserves pairwise distances within
    * 1±ε for k = O(log n / ε²) while shrinking the vectors d/k-fold
    * before any ANN / clustering pass. Map-only: the k plane rows are a
    * compile-time literal folded into codegen'd [[graft.functions.LongArrayDot]]
    * dots, so the plan is Scan → Project → Generate — zero shuffles, and
    * at 100 TB it streams at scan speed. Exact integer arithmetic end to
    * end ⇒ any engine replays the identical projection.
    *
    * Output: one scalar row (id, p, proj) per vector × plane, oracle-
    * comparable (no array-typed final columns).
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int = 64): DataFrame = {
    val q = Portable.quantize(col(vecCol), Scale)
    val planes = planeMatrix(k, dim)
    val projections = array(planes.map(pl =>
      Portable.dotQ(q, typedLit(pl.map(_.toLong).toSeq))): _*)
    // Spread BEFORE the k×dim dot products (r16, guide §2.5 input
    // skew): embeddings ship as ONE single-row-group file, so without
    // this the whole quantize+project compute runs in the scan's single
    // task while every other core idles — the exchange it adds is one
    // pass over the raw vectors, and the id key spreads evenly.
    Spread.ensure(df.select(col(idCol), col(vecCol)), idCol)
      .select(col(idCol), posexplode(projections).as(Seq("p", "proj")))
      .select(col(idCol), col("p").cast("long").as("p"), col("proj"))
  }

  /** Nearest-class-prototype classification: each labelled vector set
    * collapses to ONE prototype (the element-wise exact-integer mean of
    * its quantized vectors, `floor(sum/n)` per dimension — the
    * kmeansCentroids update rule), and every vector is re-assigned to
    * the prototype with the max exact-Long dot (tie → lowest label).
    * Agreement between `label` and `assigned` is the embedding-space
    * separability check a pipeline runs on its domain/topic labels; the
    * confusion pairs are the label-noise candidates.
    *
    * Scale: prototypes are one explode→agg pass (labels × dims rows —
    * tiny regardless of corpus), broadcast back; scoring fans each
    * vector out to L label rows map-side and immediately collapses to
    * the argmax in the same aggregation (partial max before the one
    * id-keyed shuffle). Nothing driver-side, nothing O(n²).
    * Output: (id, label, assigned, best_dot).
    */
  def nearestPrototype(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val q = Spread.ensure(
        df.select(col(idCol).as("id"), col(labelCol).cast("long").as("label"),
          Portable.quantize(col(vecCol), Scale).as("qv")), "id")
    val protos = q
      .select(col("label"), posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy("label", "d")
      .agg(floor(sum(col("x")).cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("p"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("d"), col("p")))).as("dp"))
      .select(col("label").as("plabel"), expr("transform(dp, e -> e.p)").as("pv"))
    q.crossJoin(broadcast(protos))
      .select(col("id"), col("label"),
        struct(Portable.dotQ(col("qv"), col("pv")).as("dot"),
          (-col("plabel")).as("neg")).as("cand"))
      .groupBy("id", "label")
      .agg(max(col("cand")).as("best"))
      .select(col("id"), col("label"), (-col("best.neg")).as("assigned"),
        col("best.dot").as("best_dot"))
  }

  /** Deterministic Lloyd k-means over integer-quantized vectors: init =
    * the `nlist` lowest-id training vectors, assignment = max exact-Long
    * dot (tiebreak lowest cell id), update = element-wise
    * floor(sum/count) back to integers, empty cells keep their previous
    * centroid, fixed `iters` iterations. Every step is exact integer or
    * IEEE-double arithmetic, so any engine (the DuckDB oracle included)
    * replays the identical centroids.
    *
    * Training runs on the `trainLimit` lowest-id vectors collected to the
    * driver — the standard coarse-quantizer pattern at scale (FAISS-style
    * IVF trains on a bounded sample too); assignment of the full base
    * stays distributed.
    */
  def kmeansCentroids(train: Array[Array[Long]], nlist: Int,
      iters: Int): Array[Array[Long]] = {
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var cents = train.take(nlist).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Long](train.headOption.map(_.length).getOrElse(0)))
      val counts = new Array[Long](cents.length)
      train.foreach { v =>
        var best = 0; var bestDot = Long.MinValue
        var c = 0
        while (c < cents.length) {
          val d = dot(v, cents(c))
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(s => math.floor(s.toDouble / counts(c)).toLong)
      }
    }
    cents
  }

  /** The `probes` nearest coarse cells for a vector, ranked by dot with
    * each centroid (unit-ish vectors: larger dot == closer),
    * deterministic tiebreak on cell id.
    */
  private[operators] def rankedCells(centroids: Array[(Int, Seq[Long])], v: Column,
      probes: Int): Column = {
    val scored = array(centroids.toIndexedSeq.map { case (cid, cvec) =>
      struct((-Portable.dotQ(v, typedLit(cvec))).as("negDot"),
        lit(cid).as("cell"))
    }: _*)
    transform(slice(array_sort(scored), 1, probes), s => s.getField("cell"))
  }

  /** IVF approximate top-k: a deterministic k-means coarse quantizer
    * ([[kmeansCentroids]]) assigns every base vector to its max-dot
    * centroid; a query scores only the `nprobe` nearest cells.
    * Assignment and probing are broadcast map-only stages; the candidate
    * join shuffles on cell id.
    */
  def ivfTopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      digits: Int = 6, kmeansIters: Int = 3, trainLimit: Int = 4096): DataFrame = {
    val (qv, qn) = quantized(col(vecCol))
    val withQ = Spread.ensure(base, idCol)
      .select(col(idCol).as("id"), qv.as("q"), qn.as("n"))
    val train: Array[Array[Long]] = withQ
      .orderBy("id").limit(trainLimit)
      .select("q").collect().map(_.getSeq[Long](0).toArray)
    val centroids: Array[(Int, Seq[Long])] =
      kmeansCentroids(train, nlist, kmeansIters)
        .zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    def cellsFor(v: Column, probes: Int): Column =
      rankedCells(centroids, v, probes)
    val b = withQ
      .withColumn("cell", element_at(cellsFor(col("q"), 1), 1))
    val q = queries.select(col(idCol).as("query_id"), qv.as("q_q"), qn.as("q_n"))
      .withColumn("cell", explode(cellsFor(col("q_q"), nprobe)))
    val scored = b.join(broadcast(q), "cell")
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", Portable.cosineQ(
        Portable.dotQ(col("q_q"), col("q")), col("q_n"), col("n"), digits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** SemDeDup-style SEMANTIC dedup pairs: every embedding is assigned to
    * its deterministic k-means coarse cell (the same IVF quantizer as
    * [[ivfTopK]]), and near-duplicate pairs (quantized cosine ≥ minCos)
    * are generated ONLY within cells — the cluster-then-compare shape of
    * Abbas et al.'s SemDeDup. Semantically-close vectors share an argmax
    * centroid, so the pair join is cell-equi: candidate volume is
    * Σ|cell|² instead of n², and `nlist` is the knob that holds per-cell
    * fan-out down as the corpus grows (scale nlist ∝ √n and cells stay
    * bounded). Assignment is a broadcast map-only stage; the only
    * shuffle is the cell-keyed self-join.
    *
    * Exact duplicates always share a cell (identical vector ⇒ identical
    * argmax), so unlike LSH blocking ([[nearDupPairsLsh]]) the recall-1.0
    * floor for true dups is structural, not probabilistic.
    * Output: (id_a, id_b, cos), id_a < id_b; compose with
    * Dedup.connectedComponents for survivor selection (the q52/q76
    * pattern).
    */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, nlist: Int = 16, digits: Int = 6,
      kmeansIters: Int = 3, trainLimit: Int = 4096): DataFrame = {
    val (qv, _) = quantized(col(vecCol))
    val withQ = Spread.ensure(df, idCol)
      .select(col(idCol), col(vecCol), qv.as("_semq"))
    // bounded driver-side training sample — same justified collect as
    // ivfTopK (deterministic lowest-id rows, ≤ trainLimit vectors)
    val train: Array[Array[Long]] = withQ
      .orderBy(idCol).limit(trainLimit)
      .select("_semq").collect().map(_.getSeq[Long](0).toArray)
    val centroids: Array[(Int, Seq[Long])] =
      kmeansCentroids(train, nlist, kmeansIters)
        .zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    val blocked = withQ
      .withColumn("_semcell",
        element_at(rankedCells(centroids, col("_semq"), 1), 1).cast("long"))
    nearDupPairs(blocked, idCol, vecCol, minCos, Some("_semcell"), digits)
  }

  /** [[kmeansCentroids]] with proper L2 (minimum reconstruction error)
    * assignment: argmin ‖v−c‖² = argmax (2·v·c − c·c) — still exact Long
    * arithmetic, deterministic tiebreak on lowest cell. The max-dot
    * variant ranks by direction×norm and collapses PQ codebooks; L2 is
    * what product quantization requires.
    */
  def kmeansCentroidsL2(train: Array[Array[Long]], nlist: Int,
      iters: Int): Array[Array[Long]] = {
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var cents = train.take(nlist).map(_.clone())
    for (_ <- 0 until iters) {
      val dim = train.headOption.map(_.length).getOrElse(0)
      val sums = Array.fill(cents.length)(new Array[Long](dim))
      val counts = new Array[Long](cents.length)
      val cc = cents.map(c => dot(c, c))
      train.foreach { v =>
        var best = 0; var bestScore = Long.MinValue
        var c = 0
        while (c < cents.length) {
          val s = 2 * dot(v, cents(c)) - cc(c)
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(s => math.floor(s.toDouble / counts(c)).toLong)
      }
    }
    cents
  }

  /** Product-quantization (PQ) approximate top-k — the memory-compression
    * half of the FAISS IVF+PQ architecture: each vector is split into `m`
    * subvectors, each subvector encoded as the id of its nearest codebook
    * centroid ([[kmeansCentroids]] per subspace, deterministic), so a
    * 64-float embedding is stored as m small codes. Queries score
    * candidates by ADC (asymmetric distance computation): per subspace, a
    * 16-entry table of exact integer dots query·centroid, and a
    * candidate's score is m table lookups summed — no full-vector math
    * per pair. All arithmetic is exact Long, so the SQL oracle replays
    * the identical codebooks, codes, tables, and ranking.
    *
    * Scale: codebooks train on a bounded driver sample (the IVF pattern);
    * encoding and ADC are broadcast map-only column expressions; ranking
    * is a per-query bounded window. At 100 TB the win is the stored
    * footprint (codes, not vectors) and the per-pair cost (m lookups,
    * not a dim-length dot).
    */
  def pqTopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
      kmeansIters: Int = 3, trainLimit: Int = 4096): DataFrame = {
    val (qv, _) = quantized(col(vecCol))
    val withQ = Spread.ensure(base, idCol)
      .select(col(idCol).as("id"), qv.as("q"))
    val pq = PqModel.fit(withQ, m, ksub, kmeansIters, trainLimit)
    val adc = pq.adcScores(pq.encode(withQ),
      queries.select(col(idCol).as("query_id"), qv.as("qq")))
      .filter(col("id") =!= col("query_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc").desc, col("id"))
    adc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("adc"))
  }

  /** Trained PQ codebooks + the encode / ADC builders shared by
    * [[pqTopK]] and [[ivfPqTopK]]. The codebook travels as a broadcast
    * frame (m·ksub rows) — encoding and ADC are then explode +
    * broadcast-join + aggregate, NOT m·ksub inline expressions per row
    * (which drowns codegen at ksub ≥ 64).
    */
  private[operators] final case class PqModel(bookDf: DataFrame, m: Int, dsub: Int) {

    private def subArr(v: Column): Column =
      array((0 until m).map(mi => slice(v, mi * dsub + 1, dsub)): _*)

    /** (id, mi, code): min-L2 encode — argmin (c·c − 2·v·c), tiebreak
      * lowest cell, as a lexicographic min-struct aggregate over a frame
      * with (id, q).
      */
    def encode(withQ: DataFrame): DataFrame = withQ
      .select(col("id"), posexplode(subArr(col("q"))).as(Seq("mi", "sub")))
      .join(broadcast(bookDf), "mi")
      .select(col("id"), col("mi"), struct(
        (col("cc") - Portable.dotQ(col("sub"), col("cvec")) * 2).as("ns"),
        col("cell").as("cell")).as("sc"))
      .groupBy("id", "mi").agg(min(col("sc")).as("best"))
      .select(col("id"), col("mi"), col("best.cell").as("code"))

    /** (id, mi, code, sq_err): the encode argmin plus the EXACT integer
      * squared reconstruction error ‖sub − c‖² = sub·sub + (c·c −
      * 2·sub·c) of the chosen cell — the per-subspace distortion that
      * [[Similarity.pqCalibration]] aggregates. Same single explode +
      * broadcast-join + min-struct plan as [[encode]]; the ‖sub‖² term
      * rides along as a constant per (id, mi).
      */
    def distortions(withQ: DataFrame): DataFrame = withQ
      .select(col("id"), posexplode(subArr(col("q"))).as(Seq("mi", "sub")))
      .join(broadcast(bookDf), "mi")
      .select(col("id"), col("mi"), struct(
        (col("cc") - Portable.dotQ(col("sub"), col("cvec")) * 2).as("ns"),
        col("cell").as("cell")).as("sc"),
        Portable.dotQ(col("sub"), col("sub")).as("ss"))
      .groupBy("id", "mi")
      .agg(min(col("sc")).as("best"), min(col("ss")).as("ss"))
      .select(col("id"), col("mi").cast("long").as("mi"),
        col("best.cell").as("code"),
        (col("ss") + col("best.ns")).as("sq_err"))

    /** (query_id, mi, cell, dt): per-query ADC lookup tables over a frame
      * with (query_id, qq).
      */
    def queryTables(q: DataFrame): DataFrame = q
      .select(col("query_id"), posexplode(subArr(col("qq"))).as(Seq("mi", "sub")))
      .join(broadcast(bookDf), "mi")
      .select(col("query_id"), col("mi"), col("cell"),
        Portable.dotQ(col("sub"), col("cvec")).as("dt"))

    /** (query_id, id, adc): ADC = the m table lookups summed per pair. */
    def adcScores(enc: DataFrame, q: DataFrame): DataFrame = {
      val qt = queryTables(q)
      enc
        .join(broadcast(qt), enc("mi") === qt("mi") && enc("code") === qt("cell"))
        .groupBy(enc("id"), qt("query_id")).agg(sum(col("dt")).as("adc"))
    }
  }

  private[operators] object PqModel {
    /** Train per-subspace L2 codebooks on the `trainLimit` lowest-id
      * vectors of a (id, q) frame.
      */
    def fit(withQ: DataFrame, m: Int, ksub: Int, iters: Int,
        trainLimit: Int): PqModel =
      fromTrain(withQ.sparkSession,
        withQ.orderBy("id").limit(trainLimit)
          .select("q").collect().map(_.getSeq[Long](0).toArray),
        m, ksub, iters)

    def fromTrain(spark: org.apache.spark.sql.SparkSession,
        train: Array[Array[Long]], m: Int, ksub: Int, iters: Int): PqModel = {
      import spark.implicits._
      val dim = train.head.length
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val dsub = dim / m
      val books = Array.tabulate(m) { mi =>
        val sub = train.map(v => v.slice(mi * dsub, (mi + 1) * dsub))
        kmeansCentroidsL2(sub, ksub, iters)
          .zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      }
      val bookDf = (for {
        mi <- 0 until m; (cid, cvec) <- books(mi)
      } yield (mi, cid, cvec, cvec.map(x => x * x).sum))
        .toDF("mi", "cell", "cvec", "cc")
      PqModel(bookDf, m, dsub)
    }
  }

  /** IVF + PQ combined — the full FAISS-style ANN pipeline: the coarse
    * quantizer ([[kmeansCentroids]], max-dot cells — identical to
    * [[ivfTopK]]) prunes the candidate set to the query's `nprobe`
    * cells, and product-quantization ADC ([[pqTopK]] mechanics: L2
    * subspace codebooks, integer lookup tables) scores only those
    * candidates from their m-code representation. At 100 TB this is the
    * shape that works: IVF bounds how much is scored, PQ bounds what a
    * stored vector costs (m codes, not dim floats). Fully deterministic;
    * the oracle replays coarse chain + all subspace chains.
    */
  def ivfPqTopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 16, ksub: Int = 64, kmeansIters: Int = 3,
      trainLimit: Int = 4096): DataFrame = {
    val (qv, _) = quantized(col(vecCol))
    val withQ = Spread.ensure(base, idCol)
      .select(col(idCol).as("id"), qv.as("q"))
    val train: Array[Array[Long]] = withQ
      .orderBy("id").limit(trainLimit)
      .select("q").collect().map(_.getSeq[Long](0).toArray)
    // coarse quantizer (q27-identical chain) + PQ codebooks (q55-identical)
    val coarse: Array[(Int, Seq[Long])] =
      kmeansCentroids(train, nlist, kmeansIters)
        .zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    val pq = PqModel.fromTrain(base.sparkSession, train, m, ksub, kmeansIters)
    val b = withQ.withColumn("cell", element_at(rankedCells(coarse, col("q"), 1), 1))
    val qWithQ = queries.select(col(idCol).as("query_id"), qv.as("qq"))
    val qprobe = qWithQ
      .withColumn("cell", explode(rankedCells(coarse, col("qq"), nprobe)))
    val cand = b.select("id", "cell")
      .join(broadcast(qprobe.select("query_id", "cell")), "cell")
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id").distinct()
    val adc = cand.join(pq.encode(withQ), "id")
      .join(broadcast(pq.queryTables(qWithQ).withColumnRenamed("cell", "qcell")),
        Seq("query_id", "mi"))
      .filter(col("code") === col("qcell")) // pushed into the join condition
      .groupBy("query_id", "id").agg(sum(col("dt")).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc").desc, col("id"))
    adc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("adc"))
  }

  /** Approximate top-k with multi-table random-hyperplane LSH
    * (OR-amplification): L tables of p planes each; a base row is a
    * candidate for a query iff their p-bit signatures agree in at least
    * one table. More tables ⇒ higher recall; more planes per table ⇒
    * smaller buckets ⇒ cheaper. The join shuffles on (table, bucket) —
    * or broadcasts the (small) query side — and each query scores only
    * its candidates, never the full base.
    */
  def annTopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planesPerTable: Int = 4, tables: Int = 8,
      digits: Int = 6): DataFrame = {
    val pm = planeMatrix(planesPerTable * tables, 64)
    def buckets(v: Column): Column = {
      val entries = (0 until tables).map { t =>
        val tablePlanes = pm.slice(t * planesPerTable, (t + 1) * planesPerTable)
        struct(lit(t).as("tbl"), rhpBucket(v, tablePlanes).as("bucket"))
      }
      array(entries: _*)
    }
    val (qv, qn) = quantized(col(vecCol))
    val b = Spread.ensure(base, idCol)
      .select(col(idCol).as("neighbor_id"), qv.as("b_q"), qn.as("b_n"))
      .withColumn("tb", explode(buckets(col("b_q"))))
    val q = queries.select(col(idCol).as("query_id"), qv.as("q_q"), qn.as("q_n"))
      .withColumn("tb", explode(buckets(col("q_q"))))
    val cand = b.join(broadcast(q), "tb")
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("cos", Portable.cosineQ(
      Portable.dotQ(col("q_q"), col("b_q")), col("q_n"), col("b_n"), digits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** PQ distortion calibration — the ANN sibling of
    * [[Dedup.lshCalibration]]: per subquantizer, how much signal the
    * (m, ksub) compression actually destroys. Read it before
    * committing a codebook to a 100 TB index: a subspace with
    * mean_sq_err far above its peers carries structure the codebook
    * cannot express (raise ksub or re-split dims); n_cells_used ≪ ksub
    * means dead centroids (wasted codebook bits).
    *
    * The reconstruction error ‖sub − c‖² is EXACT integer arithmetic
    * over the quantized vectors and trained integer centroids (the
    * [[PqModel]] invariant), so the whole report replays bit-for-bit
    * from the oracle's training chains. One explode + broadcast-join +
    * two aggregates — the same cost as encoding the corpus once.
    * Output: (mi, n_vecs, n_cells_used, total_sq_err,
    * mean_sq_err_milli).
    */
  def pqCalibration(base: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, kmeansIters: Int = 3,
      trainLimit: Int = 4096): DataFrame = {
    val (qv, _) = quantized(col(vecCol))
    val withQ = Spread.ensure(base, idCol)
      .select(col(idCol).as("id"), qv.as("q"))
    val pq = PqModel.fit(withQ, m, ksub, kmeansIters, trainLimit)
    pq.distortions(withQ)
      .groupBy("mi")
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("code")).as("n_cells_used"),
        sum(col("sq_err")).as("total_sq_err"))
      .withColumn("mean_sq_err_milli",
        expr("(total_sq_err * 1000) div n_vecs"))
  }

  /** Pairwise cosine between per-label integer CENTROIDS — the
    * source/topic embedding-drift matrix ("are src3's vectors
    * collapsing onto src7's?") that decides mixture weights and flags
    * label leakage, computed without ever comparing row pairs: the
    * corpus collapses to labels × dims partial sums in one map-side-
    * combined aggregate, and the pair arithmetic runs on the ≤
    * |labels|² centroid grid.
    *
    * Determinism: component sums of quantized (×1000, round) vectors
    * are exact Longs; the centroid component is a FLOOR division made
    * portable for negative sums by offsetting — `(sx + n·10⁶) div n −
    * 10⁶` — because Spark's `div` truncates toward zero while DuckDB's
    * `//` floors, and embedding sums are routinely negative. Cosine is
    * the same exact-integer-dot / IEEE-sqrt form as [[cosineTopK]].
    * Output: (label_a, label_b, n_a, n_b, cos) for label_a < label_b.
    */
  def labelCentroidMatrix(df: DataFrame, vecCol: String,
      labelCol: String, digits: Int = 6): DataFrame = {
    val per = df
      .select(col(labelCol).cast("long").as("lab"),
        posexplode(Portable.quantize(col(vecCol), Scale))
          .as(Seq("d", "x")))
      .groupBy("lab", "d")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    // session-cache + eager count: the ≤|labels|-row centroid frame
    // feeds both matrix sides and one is a broadcast — uncached, the
    // broadcast subjob re-explodes the whole corpus
    val cents = per
      .select(col("lab"), col("n"), struct(col("d"),
        expr("((sx + n * 1000000) div n) - 1000000").as("cx")).as("dc"))
      .groupBy("lab")
      .agg(max(col("n")).as("n"),
        transform(sort_array(collect_list(col("dc"))),
          s => s.getField("cx")).as("cvec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cents.count()
    val a = cents.select(col("lab").as("label_a"), col("n").as("n_a"),
      col("cvec").as("va"))
    val b = cents.select(col("lab").as("label_b"), col("n").as("n_b"),
      col("cvec").as("vb"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        Portable.cosineQ(Portable.dotQ(col("va"), col("vb")),
          Portable.dotQ(col("va"), col("va")),
          Portable.dotQ(col("vb"), col("vb")), digits).as("cos"))
  }
}
