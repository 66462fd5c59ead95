package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Deduplication operators for a training-data pipeline.
  *
  * Scale design:
  *  - exact dedup is a hash shuffle on the content key (or its hash —
  *    shuffle 8-byte keys, not document bodies);
  *  - MinHash/SimHash turn near-dup detection into equality joins on
  *    small derived keys (band buckets / bit windows), which Spark
  *    shuffles and hash-joins without ever materializing the O(n²) pair
  *    space;
  *  - candidate pairs are then verified with an exact measure (signature
  *    agreement / hamming distance), all via codegen'd built-ins.
  */
object Dedup {

  // ---------- exact ----------

  /** Keep one row per distinct `key` (lowest `tieBreak` wins) — stable
    * dropDuplicates. At scale, group on xxhash64(key) first so the
    * shuffle carries hashes, then resolve rare collisions by full key.
    */
  def exactKeepFirst(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tieBreak)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Per-content-group stats: surviving id + multiplicity. */
  def exactGroups(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---------- shingles ----------

  /** Distinct word n-gram shingles per doc: (id, shingle).
    * Tokenize → slide an n-window via transform over token indices —
    * narrow, no shuffle until the downstream distinct.
    */
  def wordShingles(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val toks = split(text, " ")
    // sequence(0, size-n) would be DESCENDING for size < n — guard to an
    // empty index list so short docs yield zero shingles.
    val idx = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    val sh = transform(idx, i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
    df.select(id.as("id"), explode(sh).as("shingle")).distinct()
  }

  // ---------- MinHash + LSH ----------

  /** k permutation-free MinHash components over xxhash64(shingle):
    * h_i(s) = (a_i * x + b_i) mod PRIME, minimized per doc. Fixed seeds →
    * fully deterministic across runs/partitions.
    */
  val MinhashPrime = 2147483647L // 2^31 - 1

  private def hashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val rnd = new scala.util.Random(42L + i)
      (math.abs(rnd.nextLong()) % (MinhashPrime - 1) + 1,
        math.abs(rnd.nextLong()) % MinhashPrime)
    }

  /** (id, sig array<long> of length k) — one shuffle (groupBy id). */
  def minhashSignatures(shingles: DataFrame, k: Int = 32): DataFrame = {
    val x = pmod(xxhash64(col("shingle")), lit(MinhashPrime))
    val comps = hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(x * a + b, lit(MinhashPrime))).as(s"__h$i")
    }
    shingles.groupBy(col("id"))
      .agg(comps.head, comps.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"__h$i")): _*).as("sig"))
  }

  /** LSH banding: split the k-component signature into bands of `rows`,
    * hash each band to a bucket. Docs sharing any (band, bucket) are
    * candidates — an equality join, not a cross product.
    */
  def lshBuckets(sigs: DataFrame, rows: Int): DataFrame = {
    val k = rows // rows per band
    sigs.select(col("id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), (size(col("sig")) / k).cast("int") - 1),
        b => xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * k + lit(1), lit(k)), _.cast("string")))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** Candidate pairs from band collisions, verified by exact signature
    * agreement (estimated Jaccard = fraction of equal components).
    */
  def minhashCandidates(sigs: DataFrame, rowsPerBand: Int = 4,
                        minEstJaccard: Double = 0.0): DataFrame = {
    val b = lshBuckets(sigs, rowsPerBand)
    val l = b.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val r = b.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (VectorFunctions.foldSum(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0))) /
          size(col("sig_a"))).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= minEstJaccard)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over token xxhash64s: per bit, sum +1/-1 across
    * tokens, sign → bit. One shuffle (groupBy id); the 64 per-bit sums
    * are map-side partial aggregates.
    */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("id"),
      explode(split(text, " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$b")
    }
    val agg = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("id"), hash.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs by SimHash: block on 4×16-bit windows (any pair
    * within hamming ≤ maxDist shares at least one window by pigeonhole
    * when maxDist ≤ 3; equality join per window, then exact verify).
    */
  def simhashCandidates(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    val windows = hashes.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(w =>
        shiftrightunsigned(col("simhash"), w * 16)
          .bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "w").withColumnRenamed("col", "wk")
    val l = windows.select(col("id").as("id_a"),
      col("simhash").as("sh_a"), col("w"), col("wk"))
    val r = windows.select(col("id").as("id_b"),
      col("simhash").as("sh_b"), col("w"), col("wk"))
    l.join(r, Seq("w", "wk")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sh_a"), col("sh_b")).as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  // ---------- n-gram Jaccard (exact) ----------

  /** Exact pairwise Jaccard over word n-gram shingles, computed as a
    * shingle equality join (group-join-count), never a cross product.
    * `leftFilter` bounds the left side (e.g. a candidate subset) so the
    * pair space stays linear in matches.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
                        n: Int, leftFilter: Column): DataFrame = {
    val sh = wordShingles(df, id, text, n)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val left = sh.where(leftFilter)
    val inter = left.select(col("id").as("da"), col("shingle"))
      .join(sh.select(col("id").as("db"), col("shingle")), Seq("shingle"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("da"), col("n_sh").as("na")), Seq("da"))
      .join(sizes.select(col("id").as("db"), col("n_sh").as("nb")), Seq("db"))
      .select(col("da"), col("db"), col("inter"), col("na"), col("nb"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jac"))
  }

  // ---------- embedding near-dup ----------

  /** Near-duplicate rows by embedding cosine ≥ threshold, restricted to
    * LSH candidate buckets (see Similarity.signBuckets) so the join is
    * equality-based.
    */
  def embeddingNearDup(embs: DataFrame, id: Column, vec: Column,
                       threshold: Double, planes: Int = 12): DataFrame = {
    val b = Similarity.signBuckets(
      embs.select(id.as("id"), vec.as("vec")), col("vec"), planes)
    val l = b.select(col("id").as("id_a"), col("vec").as("vec_a"), col("bucket"))
    val r = b.select(col("id").as("id_b"), col("vec").as("vec_b"), col("bucket"))
    l.join(r, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("vec_a"), col("vec_b")).as("cos"))
      .distinct()
      .where(col("cos") >= threshold)
  }
}
