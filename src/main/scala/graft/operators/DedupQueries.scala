package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline (exact, n-gram
  * Jaccard, SimHash, MinHash+LSH, embedding cosine).
  *
  * Scale design: nothing here is all-pairs over the corpus. Pair generation
  * is always *blocked* — by `source` for text (the candidate join keys on
  * (source, shingle)), by `label` for embeddings, by LSH band buckets for
  * MinHash — so candidate counts stay near-linear and every stage is a
  * hash shuffle on a bounded key, never a cartesian product.
  */
object DedupQueries extends QueryModule {

  // array_remove(...,'') over a codegen'd split — value-identical to the
  // interpreted-HOF form filter(split(...), t -> t <> '') the oracles mirror
  private val toks = "array_remove(split(text, ' ', -1), '')"
  private val dToks = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** Exact dedup: normalize whitespace/case, sha-256, keep min doc_id per
    * hash. One hash-shuffle on the content key.
    */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("content_hash",
        sha2(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary"), 256))
      .groupBy("content_hash")
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_copies"))
      .orderBy("survivor_id")

  private val exactDedupSql =
    """SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
      |  min(doc_id) AS survivor_id, CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY survivor_id""".stripMargin

  /** Word 4-gram shingles, distinct, as an exploded (doc, shingle) view
    * (native codegen'd kernel — functions.ShingleOps).
    */
  private def shingleFrame(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("tk", expr(toks))
      .filter(size(col("tk")) >= 4)
      .select(col("doc_id"), col("source"),
        explode(expr("word_shingles(tk, 4)")).as("shingle"))
  }

  /** A shingle shared by more than this many documents within a source is
    * boilerplate: it contributes O(df²) candidate pairs in the inverted-
    * index self-join (the classic hot-key blowup at 100 TB) while carrying
    * almost no similarity signal. Capping document frequency bounds the
    * per-shingle join fan-out; the Jaccard space becomes "informative
    * shingles only", applied identically on both engine and oracle sides.
    */
  val MaxShingleDf = 50

  /** Exact n-gram Jaccard near-dup pairs, blocked by source: candidates are
    * pairs sharing ≥1 *informative* shingle within a source (inverted-index
    * self-join over shingles with document frequency ≤ [[MaxShingleDf]]),
    * then exact J = |∩| / |∪| over that capped shingle space. Any pair
    * above the threshold necessarily shares an informative shingle, so
    * blocking loses nothing within a source; the df cap keeps the worst
    * shingle's fan-out bounded regardless of corpus size.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // df cap as a window over (source, shingle): one hash shuffle of the
    // shingle frame, computed in the same pass that feeds the candidate
    // join (measured faster here than a count+broadcast-anti-join variant,
    // which shingles the corpus twice; at cluster scale either works — the
    // essential property is that no shingle can fan out more than MaxDf²)
    // consumed by counts + BOTH self-join sides: materialize once
    // (optimization r17) instead of three corpus explodes + df windows;
    // size-gated (r18): the shingle frame is corpus-sized, so above the
    // input gate it goes to scratch parquet instead of pinned blocks
    val sh = Materialize.gated(Tables.documents(s, dir),
      shingleFrame(s, dir)
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy("source", "shingle")))
        .filter(col("df") <= MaxShingleDf)
        .drop("df"),
      "njac-sh")
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("source"), col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("source").as("source_b"), col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    val inter = a.join(b,
        col("source") === col("source_b") && col("shingle") === col("shingle_b") &&
          col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 4))
      .filter(col("jaccard") >= 0.1)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Shingle-containment pairs — the ASYMMETRIC companion to
    * [[ngramJaccard]]: C = |S(A)∩S(B)| / min(|S(A)|,|S(B)|) detects a
    * document CONTAINED in another (quotes, excerpts, page-in-page)
    * that symmetric Jaccard under-scores when sizes differ. Blocking is
    * corpus-global (excerpts travel across sources), with the same
    * df ≤ 50 cap bounding every shingle's fan-out at O(df²) regardless
    * of corpus size. Output labels the contained/container side (tie →
    * smaller doc_id is "contained").
    */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    // counts + both self-join sides: one materialization (optimization
    // r17), size-gated (r18) — corpus-sized frame
    val sh = Materialize.gated(Tables.documents(s, dir),
      shingleFrame(s, dir)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .filter(col("df") <= MaxShingleDf)
        .select("doc_id", "shingle"),
      "cont-sh")
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    val inter = a.join(b,
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("containment",
        round(col("inter").cast("double") / least(col("n_a"), col("n_b")).cast("double"), 4))
      .filter(col("containment") >= 0.07)
      .select(
        when(col("n_a") <= col("n_b"), col("doc_a")).otherwise(col("doc_b")).as("contained_doc"),
        when(col("n_a") <= col("n_b"), col("doc_b")).otherwise(col("doc_a")).as("container_doc"),
        col("containment"))
      .orderBy("contained_doc", "container_doc")
  }

  private val containmentPairsSql =
    s"""WITH sh_raw AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3])))) AS shingle
       |  FROM (SELECT doc_id, $dToks AS tk FROM documents)
       |  WHERE len(tk) >= 4
       |), sh AS (
       |  SELECT doc_id, shingle FROM (
       |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
       |    FROM sh_raw)
       |  WHERE df <= $MaxShingleDf
       |), counts AS (
       |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT doc_a, doc_b, ca.n_sh AS n_a, cb.n_sh AS n_b,
       |    round(inter / CAST(least(ca.n_sh, cb.n_sh) AS DOUBLE), 4) AS containment
       |  FROM inter JOIN counts ca ON ca.doc_id = doc_a
       |  JOIN counts cb ON cb.doc_id = doc_b)
       |SELECT CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END AS contained_doc,
       |  CASE WHEN n_a <= n_b THEN doc_b ELSE doc_a END AS container_doc,
       |  containment
       |FROM scored WHERE containment >= 0.07
       |ORDER BY contained_doc, container_doc""".stripMargin

  /** Minimum Jaccard for [[prefixFilter]] — replicas sit ≥ 0.8 on this
    * fixture, unrelated docs < 0.2, so 0.6 exercises the filter with a
    * clean margin on both sides.
    */
  val PrefixTau = 0.6

  /** Prefix-filtering set-similarity self-join (the PPJoin family,
    * Xiao/Wang/Lin/Yu WWW'08): order every document's shingle set by
    * ASCENDING global document frequency (rarest first) and join only on
    * each document's first n − ⌈τ·n⌉ + 1 shingles — any pair with
    * J ≥ τ must collide inside those prefixes, so the candidate set is
    * exact while the inverted index only carries the RARE end of each
    * set. The complementary scheme to the df-capped full-index joins
    * ([[ngramJaccard]]): instead of capping hot shingles after indexing
    * everything, it never indexes the hot tail at all — candidate
    * fan-out is bounded by the rarity of prefix shingles, which is the
    * property that survives a 100 TB corpus with power-law boilerplate.
    * The ⌈τ·n⌉ is integer-exact ((6n+9) div 10) so both engines cut
    * identical prefixes. Verification is candidate-keyed (cand × doc_a's
    * shingles, matched into doc_b's), never all-pairs.
    */
  def prefixFilter(s: SparkSession, dir: String): DataFrame = {
    // counts, the prefix windows, and both intersection probes all read
    // sh: one materialization (optimization r17), size-gated (r18)
    val sh = Materialize.gated(Tables.documents(s, dir),
      shingleFrame(s, dir).select("doc_id", "shingle"), "prefix-sh")
    val prefix = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df").asc, col("shingle").asc)))
      .filter(col("rn") <= col("n") - expr("(6 * n + 9) div 10") + 1)
      .select("doc_id", "shingle")
    val cand = prefix.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b")),
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b")),
        Seq("doc_b"))
      .filter(col("shingle") === col("shingle_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 4))
      .filter(col("jaccard") >= PrefixTau)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  private val prefixFilterSql =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3])))) AS shingle
       |  FROM (SELECT doc_id, $dToks AS tk FROM documents)
       |  WHERE len(tk) >= 4
       |), ranked AS (
       |  SELECT doc_id, shingle, n,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY df ASC, shingle ASC) AS rn
       |  FROM (
       |    SELECT doc_id, shingle,
       |      count(*) OVER (PARTITION BY shingle) AS df,
       |      count(*) OVER (PARTITION BY doc_id) AS n
       |    FROM sh)
       |), prefix AS (
       |  SELECT doc_id, shingle FROM ranked
       |  WHERE rn <= n - ((6 * n + 9) // 10) + 1
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM prefix a JOIN prefix b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |), counts AS (
       |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cand c
       |  JOIN sh x ON x.doc_id = c.doc_a
       |  JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(i AS DOUBLE) / (ca.n_sh + cb.n_sh - i), 4) AS jaccard
       |FROM inter JOIN counts ca ON doc_a = ca.doc_id
       |JOIN counts cb ON doc_b = cb.doc_id
       |WHERE round(CAST(i AS DOUBLE) / (ca.n_sh + cb.n_sh - i), 4) >= $PrefixTau
       |ORDER BY doc_a, doc_b""".stripMargin

  private val ngramJaccardSql =
    s"""WITH sh_raw AS (
       |  SELECT doc_id, source, unnest(list_distinct(list_transform(
       |    range(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3])))) AS shingle
       |  FROM (SELECT doc_id, source, $dToks AS tk FROM documents)
       |  WHERE len(tk) >= 4
       |), sh AS (
       |  SELECT doc_id, source, shingle FROM (
       |    SELECT doc_id, source, shingle,
       |      count(*) OVER (PARTITION BY source, shingle) AS df
       |    FROM sh_raw)
       |  WHERE df <= 50
       |), counts AS (
       |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.source = b.source AND a.shingle = b.shingle
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter), 4) AS jaccard
       |FROM inter JOIN counts ca ON doc_a = ca.doc_id
       |JOIN counts cb ON doc_b = cb.doc_id
       |WHERE round(CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter), 4) >= 0.1
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Portable 32-bit SimHash over distinct tokens (md5-nibble bits,
    * identical arithmetic in both engines). Spark computes it with nested
    * higher-order functions — no explode, no shuffle per token — then
    * counts bucket sizes per fingerprint.
    */
  /** (doc_id, simhash) fingerprints — shared by [[simhash]] and the banded
    * pairing in [[simhashPairs]].
    */
  private def simhashFrame(s: SparkSession, dir: String): DataFrame = {
    // native codegen'd kernel (functions.SimhashOps): one loop per row —
    // md5 each DISTINCT token once, 32 bit-votes from the digest nibbles,
    // sign fold — value-identical to the aggregate/transform/zip_with HOF
    // pipeline the DuckDB oracle replays, which stays interpreted in
    // Spark and cost ~8× more at sf0.1 (the dedup_simhash family's whole
    // base cost was this fingerprint)
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("simhash", expr(s"simhash64($toks)"))
      .select(col("doc_id"), col("simhash"))
  }

  def simhash(s: SparkSession, dir: String): DataFrame =
    simhashFrame(s, dir)
      .withColumn("bucket_size", count(lit(1)).over(Window.partitionBy("simhash")))
      .orderBy("doc_id")

  /** A simhash band-bucket holding more than this many docs is a template
    * artifact: it contributes O(size²) candidates while its members are
    * already findable through their other three bands. Same bounded-fan-out
    * rationale as [[MaxShingleDf]].
    */
  val MaxBandBucket = 20

  /** Banded simhash pairing — the INDEX side of simhash dedup (the
    * Google-style near-dup pipeline): the 32-bit fingerprint splits into
    * 4×8-bit bands; docs agreeing on any band become candidates (hot
    * buckets capped at [[MaxBandBucket]]); candidates verify at Hamming
    * distance ≤ 1 via bit_count(xor). By pigeonhole, any pair at distance
    * ≤ 3 agrees on some band, so banding loses nothing the verify step
    * would keep. Scale shape: one band-keyed shuffle with the cap bounding
    * every bucket's fan-out; the verify is per-pair arithmetic.
    */
  /** Pre-cap banded simhash view (doc_id, simhash, band, bv) — shared by
    * [[simhashPairs]] and the scale-sweep pair census.
    */
  private def shBanded(frame: DataFrame): DataFrame =
    frame
      .select(col("doc_id"), col("simhash"), explode(expr(
        "transform(sequence(0, 3), r -> struct(r AS band, shiftright(simhash, CAST(r * 8 AS INT)) & 255 AS bv))"))
        .as("x"))
      .select(col("doc_id"), col("simhash"), col("x.band").as("band"), col("x.bv").as("bv"))

  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val banded = shBanded(simhashFrame(s, dir))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bv")))
      .filter(col("bsz") <= MaxBandBucket)
    val a = banded.select(col("band"), col("bv"), col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = banded.select(col("band").as("band_b"), col("bv").as("bv_b"),
      col("doc_id").as("doc_b"), col("simhash").as("sb"))
    a.join(b, col("band") === col("band_b") && col("bv") === col("bv_b") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sa", "sb").distinct()
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .filter(col("hamming") <= 1)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  private val simhashPairsSql =
    s"""WITH dt AS (
       |  SELECT doc_id, unnest(list_distinct($dToks)) AS t FROM documents
       |), bits AS (
       |  SELECT doc_id, r.range AS b,
       |    CASE WHEN ((instr('0123456789abcdef', substr(md5(t), CAST(r.range // 4 AS INT) + 1, 1)) - 1)
       |      >> (r.range % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
       |  FROM dt CROSS JOIN range(0, 32) r
       |), acc AS (
       |  SELECT doc_id, b, sum(v) AS sv FROM bits GROUP BY doc_id, b
       |), fp AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN sv > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM acc GROUP BY doc_id
       |), banded AS (
       |  SELECT doc_id, simhash, r.range AS band,
       |    (simhash >> CAST(r.range * 8 AS INT)) & 255 AS bv
       |  FROM fp CROSS JOIN range(0, 4) r
       |), capped AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bv) AS bsz FROM banded)
       |  WHERE bsz <= $MaxBandBucket
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 1
       |ORDER BY doc_a, doc_b""".stripMargin

  private val simhashSql =
    s"""WITH dt AS (
       |  SELECT doc_id, unnest(list_distinct($dToks)) AS t FROM documents
       |), bits AS (
       |  SELECT doc_id, r.range AS b,
       |    CASE WHEN ((instr('0123456789abcdef', substr(md5(t), CAST(r.range // 4 AS INT) + 1, 1)) - 1)
       |      >> (r.range % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
       |  FROM dt CROSS JOIN range(0, 32) r
       |), acc AS (
       |  SELECT doc_id, b, sum(v) AS sv FROM bits GROUP BY doc_id, b
       |), fp AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN sv > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM acc GROUP BY doc_id)
       |SELECT doc_id, simhash,
       |  CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS bucket_size
       |FROM fp ORDER BY doc_id""".stripMargin

  /** MinHash + LSH near-dup detection. 16-component signature via the
    * Kirsch-Mitzenmacher construction — one *portable* md5 per shingle
    * yields two 52-bit integers (nibble folds of hex chars 1-13 and 14-26),
    * and component k is `min over shingles of (h1 + k*h2)` — so the exact
    * same arithmetic runs in DuckDB and the query is oracle-checked, unlike
    * an engine-hash (xxhash64) signature. 4 bands × 4 rows; candidates join
    * on (band, band-hash) buckets. The band bucket key itself stays
    * xxhash64: bucket equality ⟺ 4-tuple equality, so any injective-enough
    * hash yields identical candidate pairs while keeping the shuffle key an
    * 8-byte long (the oracle joins on the md5 of the same 4-tuple).
    *
    * Candidate dedup is on (doc_a, doc_b) KEYS ONLY — the wide shingle/sig
    * arrays are re-joined after `.distinct()`, so the dedup shuffle moves
    * 16-byte pairs, not whole documents' shingle sets (the 100 TB shape).
    */
  // The signature is computed by the native codegen'd MinhashSignature
  // expression (functions.MinhashOps): one md5 per shingle, component-
  // wise minima of h1 + k*h2 in a single loop — bit-identical to the
  // DuckDB oracle's conv()-based hex arithmetic. The frame is consumed
  // at least twice by every caller (band self-join; minhashLsh adds two
  // verify joins) so it is cached; at cluster scale this is the frame you
  // would checkpoint (16 longs + shingle set/doc). Same plan in both
  // callers → one shared cache entry.
  private def lshDocs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("tk", expr(toks))
      .filter(size(col("tk")) >= 4)
      .withColumn("shingles", expr("word_shingles(tk, 4)"))
      .withColumn("sig", expr("minhash_sig(shingles, 16)"))
      .select("doc_id", "shingles", "sig")
      .cache()
  }

  /** Distinct LSH candidate pairs (doc_a < doc_b), keys only — the shared
    * front half of [[minhashLsh]] (which re-joins the wide columns for
    * verification) and [[dedupClusters]] (which needs only the edges).
    *
    * Pairing within a (band, bucket) is ANCHOR (star) pairing — every doc
    * pairs with its bucket's min doc_id, never all-pairs. A bucket of k
    * docs emits k-1 edges instead of C(k,2): linear in bucket size, so a
    * boilerplate-heavy bucket (thousands of identical docs — exactly what
    * the 10× scale sweep's verbatim replication simulates) costs k edges,
    * not k²/2. The transitive closure is unchanged — a bucket's star and
    * its clique have identical connected components — so [[dedupClusters]]
    * computes the same clusters; only the enumerated pair LIST shrinks to
    * the spanning edges (the shape large-scale MinHash pipelines emit).
    */
  /** Banded minhash view (doc_id, band, bhash) — shared by
    * [[lshCandidates]] and the scale-sweep pair census.
    */
  private def mhBanded(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      explode(expr(
        """transform(sequence(0, 3),
          |  b -> named_struct('band', b, 'bhash', xxhash64(slice(sig, b * 4 + 1, 4))))""".stripMargin))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))

  private def lshCandidates(docs: DataFrame): DataFrame =
    starEdges(mhBanded(docs))

  /** Anchor (star) pairing over a banded-postings frame (doc_id, band,
    * bhash): one exchange on the bucket key; the unordered window min
    * streams the bucket without sorting it. Factored from
    * [[lshCandidates]] so the incremental-maintenance path can pair over
    * PERSISTED postings without touching document text.
    */
  private def starEdges(postings: DataFrame): DataFrame =
    postings
      .withColumn("anchor",
        min(col("doc_id")).over(Window.partitionBy("band", "bhash")))
      .filter(col("doc_id") > col("anchor"))
      .select(col("anchor").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()

  /** Candidate-pair census for the scale-sweep artifact (BENCH_SCALE):
    * bucket-size and emitted-pair counts for the two banded pair
    * generators, pre- and post-cap, so cap utilization at N× data is read
    * directly off the artifact instead of re-derived from duplicate-
    * cluster arithmetic each round. Only tiny aggregates reach the driver
    * (a handful of longs); `clique_pairs` is what an uncapped all-pairs
    * bucket join WOULD have emitted — the avoided quadratic.
    */
  private[graft] def pairCensus(s: SparkSession, dir: String): Seq[(String, Long)] = {
    val docs = lshDocs(s, dir)
    try {
      // DIV, not `/`: Spark's slash is double division; bucket sizes are
      // counts, and the census must stay exact longs
      val mh = mhBanded(docs).groupBy("band", "bhash").count()
        .agg(
          expr("sum(count - 1)").as("star"),
          expr("sum((count * (count - 1)) DIV 2)").as("clique"),
          expr("max(count)").as("maxb"))
        .collect()(0)
      val mhDistinct = lshCandidates(docs).count()
      val sh = shBanded(simhashFrame(s, dir)).groupBy("band", "bv").count()
        .agg(
          expr("sum((count * (count - 1)) DIV 2)").as("pre"),
          expr(s"sum(CASE WHEN count <= $MaxBandBucket THEN (count * (count - 1)) DIV 2 ELSE 0 END)").as("post"),
          expr("max(count)").as("maxb"))
        .collect()(0)
      // the shingle df-cap has TWO distinct blocking scopes that must be
      // censused separately: ngramJaccard caps df within (source, shingle)
      // while containmentPairs caps the corpus-GLOBAL shingle df — the
      // same shingle can be under the per-source cap in every source yet
      // over the global cap (and dropped by containment)
      val ng = shingleFrame(s, dir).groupBy("source", "shingle").count()
        .agg(
          expr("sum((count * (count - 1)) DIV 2)").as("pre"),
          expr(s"sum(CASE WHEN count <= $MaxShingleDf THEN (count * (count - 1)) DIV 2 ELSE 0 END)").as("post"),
          expr("max(count)").as("maxdf"))
        .collect()(0)
      val ct = shingleFrame(s, dir).groupBy("shingle").count()
        .agg(
          expr("sum((count * (count - 1)) DIV 2)").as("pre"),
          expr(s"sum(CASE WHEN count <= $MaxShingleDf THEN (count * (count - 1)) DIV 2 ELSE 0 END)").as("post"),
          expr("max(count)").as("maxdf"))
        .collect()(0)
      Seq(
        "minhash_star_edges" -> mh.getLong(0),
        "minhash_clique_pairs_avoided" -> mh.getLong(1),
        "minhash_distinct_pairs" -> mhDistinct,
        "minhash_max_bucket" -> mh.getLong(2),
        "simhash_pairs_precap" -> sh.getLong(0),
        "simhash_pairs_postcap" -> sh.getLong(1),
        "simhash_max_bucket" -> sh.getLong(2),
        "ngram_pairs_precap" -> ng.getLong(0),
        "ngram_pairs_postcap" -> ng.getLong(1),
        "ngram_max_df" -> ng.getLong(2),
        "containment_pairs_precap" -> ct.getLong(0),
        "containment_pairs_postcap" -> ct.getLong(1),
        "containment_max_df" -> ct.getLong(2))
    } finally docs.unpersist()
  }

  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = lshDocs(s, dir)
    val cand = lshCandidates(docs)
    // Verify joins stream the docs cache map-side against the BROADCAST
    // candidate set (LSH keeps candidates near-linear and tiny relative to
    // the corpus) — no shuffle of the wide shingle/sig columns at any
    // point, and no re-plan round for AQE to discover the same thing.
    val withA = docs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
        col("sig").as("sig_a"))
      .join(broadcast(cand), "doc_a")
    docs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
        col("sig").as("sig_b"))
      .join(broadcast(withA), "doc_b")
      .withColumn("est_jaccard", round(expr(
        "CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) AS DOUBLE) / 16D"), 4))
      .withColumn("exact_jaccard", round(expr(
        """CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) /
          |CAST(size(array_union(sh_a, sh_b)) AS DOUBLE)""".stripMargin), 4))
      .select("doc_a", "doc_b", "est_jaccard", "exact_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Shared oracle CTEs: documents → shingles → portable minhash sigs →
    * LSH bands → distinct candidate pairs (used by both the pair query and
    * the connected-components clustering query).
    */
  private val lshCandCtes =
    s"""docs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3]))) AS shingles
       |  FROM (SELECT doc_id, $dToks AS tk FROM documents)
       |  WHERE len(tk) >= 4
       |), sigs AS (
       |  SELECT doc_id, shingles,
       |    list_transform(range(0, 16), k -> list_min(list_transform(list_zip(
       |      list_transform(shingles, sh -> CAST(('0x' || substr(md5(sh), 1, 13)) AS BIGINT)),
       |      list_transform(shingles, sh -> CAST(('0x' || substr(md5(sh), 14, 13)) AS BIGINT))),
       |      p -> p[1] + k * p[2]))) AS sig
       |  FROM docs
       |), banded AS (
       |  SELECT doc_id, r.range AS band,
       |    md5(concat_ws(',', sig[CAST(r.range * 4 + 1 AS INT)], sig[CAST(r.range * 4 + 2 AS INT)],
       |                       sig[CAST(r.range * 4 + 3 AS INT)], sig[CAST(r.range * 4 + 4 AS INT)])) AS bhash
       |  FROM sigs CROSS JOIN range(0, 4) r
       |), cand AS (
       |  SELECT DISTINCT anchor AS doc_a, doc_id AS doc_b FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bhash) AS anchor
       |    FROM banded)
       |  WHERE doc_id > anchor
       |)""".stripMargin

  private val minhashLshSql =
    s"""WITH $lshCandCtes
       |SELECT doc_a, doc_b,
       |  round(CAST(len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) AS DOUBLE) / 16, 4)
       |    AS est_jaccard,
       |  round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE), 4)
       |    AS exact_jaccard
       |FROM cand JOIN sigs sa ON doc_a = sa.doc_id JOIN sigs sb ON doc_b = sb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Embedding near-dup: top-5 closest candidate pairs per label by
    * cosine. Candidate generation is LSH-blocked sorted-neighborhood — the
    * strictly-linear 100 TB shape: within each (label, 4-bit hyperplane
    * bucket) cell, vectors are ordered by a 1-D projection (the double sum
    * of components) and each vector pairs with its next W=5 neighbors via
    * `lead`, so a cell of k vectors emits ≤ k·W pairs — NO self-join and
    * no quadratic blowup anywhere, even when the corpus is adversarially
    * duplicated (bit-identical replicas share bucket AND projection, so
    * they sort adjacent and are always caught). The final top-5-per-label
    * ranking goes through the native two-phase [[graft.plans.TopKPerGroup]]
    * operator, NOT a row_number window: with a handful of labels a
    * label-partitioned window funnels the whole pair set through n_labels
    * reducers for a full sort (measured 30.7× at 10× data), whereas the
    * partial phase keeps ≤ 5 rows per label per map task, so the exchange
    * moves O(labels · tasks) rows and the reducers rank a few dozen rows
    * regardless of corpus size. Ranking follows the float-ordering rule
    * (bm25TopK): row-number over the ROUNDED cosine with (id_a, id_b)
    * tie-breaks, identical in both engines; the 1-D projection is rounded
    * too so the neighborhood ORDER is portable, not just associative.
    */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", expr("hyperplane_bucket(embedding, 4)"))
      // explicit left-fold over doubles — same association order as the
      // oracle's list arithmetic, so the neighborhood order is portable
      .withColumn("proj",
        round(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"), 4))
    val cell = Window.partitionBy("label", "bucket").orderBy(asc("proj"), asc("vec_id"))
    val nbr = (1 to 5).map(i =>
      lead(struct(col("vec_id"), col("embedding")), i).over(cell))
    val pairs = e
      .select(col("label"), col("vec_id"), col("embedding"), array(nbr: _*).as("nbrs"))
      .withColumn("nbr", explode(col("nbrs")))
      .filter(col("nbr").isNotNull)
      .select(col("label"),
        least(col("vec_id"), col("nbr.vec_id")).as("id_a"),
        greatest(col("vec_id"), col("nbr.vec_id")).as("id_b"),
        round(expr("cosine_sim(embedding, nbr.embedding)"), 4).as("cosine"))
    graft.plans.GroupTopK(pairs, 5, Seq("label"),
        Seq(desc("cosine"), asc("id_a"), asc("id_b")))
      .select(col("label"), col("id_a"), col("id_b"), col("cosine"),
        col("gtk_rank").as("rn"))
      .orderBy("label", "rn")
  }

  private val embeddingNearDupSql =
    """WITH bucketed AS (
      |  SELECT vec_id, label, embedding,
      |    CAST(list_sum(list_transform(range(0, 4), p ->
      |      CASE WHEN list_sum(list_transform(list_zip(embedding, range(0, len(embedding))),
      |        pr -> CAST(pr[1] AS DOUBLE) *
      |          (CASE WHEN (instr('0123456789abcdef',
      |             substr(md5(concat_ws(':', p, pr[2])), 1, 1)) - 1) % 2 = 0
      |           THEN 1 ELSE -1 END))) > 0
      |      THEN (1 << CAST(p AS INT)) ELSE 0 END)) AS INT) AS bucket,
      |    round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS proj
      |  FROM embeddings
      |), ordered AS (
      |  SELECT vec_id, label, embedding, bucket,
      |    row_number() OVER (PARTITION BY label, bucket ORDER BY proj, vec_id) AS pos
      |  FROM bucketed
      |), pairs AS (
      |  SELECT a.label,
      |    least(a.vec_id, b.vec_id) AS id_a, greatest(a.vec_id, b.vec_id) AS id_b,
      |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
      |  FROM ordered a JOIN ordered b
      |    ON a.label = b.label AND a.bucket = b.bucket
      |   AND b.pos BETWEEN a.pos + 1 AND a.pos + 5
      |), ranked AS (
      |  SELECT label, id_a, id_b, round(cos, 4) AS cosine,
      |    row_number() OVER (PARTITION BY label
      |      ORDER BY round(cos, 4) DESC, id_a ASC, id_b ASC) AS rn
      |  FROM pairs)
      |SELECT label, id_a, id_b, cosine, CAST(rn AS INT) AS rn
      |FROM ranked WHERE rn <= 5 ORDER BY label, rn""".stripMargin

  /** Near-duplicate survivorship: connected components over the LSH
    * candidate-pair graph, each doc labeled with its component's min
    * doc_id, one survivor per cluster. Label propagation (the HashToMin
    * shape): every round is one distributed min-aggregation keyed on
    * doc_id; the driver only checks convergence (a count), never touches
    * rows. Rounds are bounded by component diameter — near-dup components
    * are short chains in practice, and the cap (25) makes a pathological
    * path graph fail loudly instead of looping forever. The oracle is the
    * same closure as a DuckDB recursive CTE over identical candidates.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    // cluster size as a window over the converged labels: one shuffle on
    // the label key, not an aggregate plus a join back
    clusterLabels(s, dir)
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("label")))
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("label")).as("is_survivor"))
      .orderBy("doc_id")

  /** Converged connected-component labels (doc_id, label) over the LSH
    * candidate graph — the shared closure behind [[dedupClusters]] and the
    * quality-based survivor selection in CurationQueries. Only docs that
    * appear in at least one candidate pair carry a label, so every labeled
    * component has ≥ 2 members by construction.
    *
    * The converged labels are MATERIALIZED once per fixture dir to a
    * scratch parquet and every consumer reads that table: the closure is
    * an iterative multi-job computation, so recomputing it per consumer
    * query doubles-to-triples its cost (measured 2.4× on the r5 sweep
    * after the per-query cache-release fix), and at 100 TB the cluster
    * assignment IS a persisted table (built once per corpus snapshot, read
    * by every downstream curation job), not a per-query lineage. Disk, not
    * executor cache — nothing outlives a query in memory, and the JVM-exit
    * sweeper reclaims the directory.
    */
  private val ccLabelsMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The persisted MinHash band index over the STANDING corpus (doc_id %
    * 10 != batchMod — the same corpus/batch split as [[incrementalDedup]]):
    * `postings` (doc_id, band, bhash) written as a managed table BUCKETED
    * on (band, bhash) — the cluster-scale layout (VERDICT r14 #4), where
    * the per-batch probe joins on exactly the bucketing key so the
    * index side is read co-located with ZERO index-side exchange
    * (PlanSpec pins it) — plus the forward signature table `sigs`
    * (doc_id, sig) as plain parquet (it joins on doc_id, not the bucket
    * key). Both are written ONCE per (session, fixture, split) from a
    * single corpus pass and memoized — the production daily-crawl shape, where
    * the band index is a maintained table (built by ingest, MERGEd per
    * batch, probed by every dedup job), not a per-query lineage that
    * re-shingles the whole corpus each run.
    *
    * `batchMod` selects which doc_id % 10 slice plays "today's batch"
    * (default 9 — the declared queries' split); InvariantSpec replays the
    * incremental maintenance under alternative splits to pin that the
    * incremental ≡ from-scratch equivalence is split-independent.
    */
  private val bandIndexMemo = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[operators] def dropManagedTable(s: SparkSession, tbl: String): Unit = {
    // a managed table of the same name can survive from a PREVIOUS JVM in
    // the cwd warehouse; drop both catalog entry and stale location before
    // (re)writing — same hygiene as SourceQueries.dropManaged
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      val wh = java.nio.file.Paths.get(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath)
      val loc = wh.resolve(tbl)
      if (java.nio.file.Files.exists(loc)) {
        val walk = java.nio.file.Files.walk(loc)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    } catch { case _: Throwable => () }
  }

  /** The corpus-side shingle/signature lineage (the ONE pass that may
    * legally scan the corpus complement `doc_id % 10 != batchMod`) —
    * exposed so PlanSpec's no-corpus-re-shingle guards have a POSITIVE
    * control (ADVICE r14 #3): this frame's plan DOES carry the
    * NOT-batch filter the absence-regex hunts for, proving the regex can
    * detect the regression it guards against.
    */
  private[graft] def corpusSigsFrame(s: SparkSession, dir: String, batchMod: Int = 9): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .filter(col("doc_id") % 10 =!= batchMod)
      .withColumn("tk", expr(toks))
      .filter(size(col("tk")) >= 4)
      .withColumn("shingles", expr("word_shingles(tk, 4)"))
      .withColumn("sig", expr("minhash_sig(shingles, 16)"))
      .select("doc_id", "sig")
  }

  private[graft] def bandIndex(s: SparkSession, dir: String, batchMod: Int = 9)
      : (DataFrame, DataFrame) = {
    // session-keyed like batchSigsMemo (ADVICE r15 #2): the memo stores a
    // catalog table name, and the in-memory catalog dies with the session
    // that created it — a session recreated in the same JVM must rebuild,
    // not resolve a stale name. The table name is derived from the
    // SANITIZED fixture key (not its hashCode), so two fixtures can never
    // collide into serving each other's postings.
    val (tbl, sigsPath) = bandIndexMemo.computeIfAbsent(
      s"${System.identityHashCode(s)}:${docsFixtureKey(dir)}#m$batchMod", _ => {
        val out = graft.Scratch.dir("graft-band-index")
        // the session identity is part of the NAME, not just the memo key
        // (ADVICE r16 #3): two live sessions in one JVM share a warehouse
        // dir, so a session-independent name would let the second session's
        // overwrite replace files the first session's catalog entry points
        // at mid-read; a per-session suffix makes the two tables disjoint
        val tblName = ("graft_band_postings_" +
          s"${docsFixtureKey(dir)}_m${batchMod}_s${System.identityHashCode(s)}")
          .replaceAll("[^A-Za-z0-9]", "_")
        val corpus = corpusSigsFrame(s, dir, batchMod).cache()
        dropManagedTable(s, tblName)
        mhBanded(corpus).write.mode("overwrite")
          .bucketBy(8, "band", "bhash").saveAsTable(tblName)
        corpus.write.mode("overwrite").parquet(s"$out/sigs")
        corpus.unpersist()
        (tblName, s"$out/sigs")
      })
    (s.table(tbl), graft.Tables.loadPath(s, sigsPath))
  }

  /** The per-batch signature frame (doc_id, sig) for the doc_id % 10 ==
    * batchMod slice — the shared "today's crawl" input of
    * [[indexMaintenance]], [[incrementalClusters]] and
    * [[indexMaintenanceCensus]]. Memoized CACHED per (session, fixture,
    * split) — the write-once pattern ADVICE r14 #5 asked for: the three
    * consumers used to each build and cache their own copy per
    * invocation, which accumulated unreleased CacheManager entries across
    * best-of-N bench runs; one shared entry per fixture is bounded. A
    * sweep-level clearCache() silently de-registers the entry, so every
    * ACCESS re-arms the cache when the frame's storage level has dropped
    * to NONE (ADVICE r15 #1: without the re-arm, the first consumer after
    * a clearCache ran uncached for the rest of the sweep and each
    * consumer subtree re-shingled the batch inside its own plan). cache() and
    * not localCheckpoint so the batch's provenance (the `% 10 = batchMod`
    * filter over the ONLY documents scan) stays visible in consumer plans
    * — PlanSpec pins it.
    */
  private val batchSigsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def batchSigs(s: SparkSession, dir: String, batchMod: Int = 9): DataFrame = {
    val frame = batchSigsMemo.computeIfAbsent(
      s"${System.identityHashCode(s)}:${docsFixtureKey(dir)}#m$batchMod", _ =>
        Tables.documents(s, dir)
          .filter(col("doc_id") % 10 === batchMod)
          .withColumn("tk", expr(toks))
          .filter(size(col("tk")) >= 4)
          .withColumn("shingles", expr("word_shingles(tk, 4)"))
          .withColumn("sig", expr("minhash_sig(shingles, 16)"))
          .select("doc_id", "sig"))
    // re-arm after any external clearCache(); storageLevel asks the
    // CacheManager, so this is a no-op while the entry is still live
    if (frame.storageLevel == org.apache.spark.storage.StorageLevel.NONE) frame.cache()
    frame
  }

  /** Incremental index maintenance + probe — the production shape of
    * [[incrementalDedup]] for a daily crawl: the corpus band index is a
    * PERSISTED table ([[bandIndex]]), the maintenance delta is exactly the
    * new batch's postings/signatures (batch-sized, not corpus-sized), and
    * the probe runs new-vs-(index ∪ batch) through the merged postings —
    * so an unchanged corpus is never re-shingled (VERDICT r12 #6 / r13 #2).
    * For each colliding new doc: how many distinct band buckets it hit,
    * its earliest colliding doc (old OR earlier new — the bucket's
    * representative, mirroring the anchor pairing of [[lshCandidates]]),
    * and the estimated Jaccard vs that anchor from the stored signatures.
    * The DuckDB twin recomputes everything from scratch, which pins
    * persisted-index ≡ from-scratch semantics.
    */
  def indexMaintenance(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val (idx, corpusSigs) = bandIndex(s, dir)
    // the new batch — the ONLY documents scan in this query's plan
    val batch = batchSigs(s, dir)
    val newPostings = mhBanded(batch)
    val mergedSigs = corpusSigs.unionByName(batch)
    // probe through the merged index (persisted ∪ delta), SPLIT as
    // (probe ⋈ index) ∪ (probe ⋈ delta) rather than probe ⋈ union: the
    // index leg then joins the bucketed table on exactly its bucketing
    // key, so the index side is read co-located with no exchange — a
    // union would discard the bucketing. Only buckets the batch hits are
    // touched; other_id < doc_id keeps the earliest doc as each bucket's
    // representative (a batch doc novel to every bucket emits nothing).
    def probe(side: DataFrame): DataFrame = newPostings
      .join(side.withColumnRenamed("doc_id", "other_id"), Seq("band", "bhash"))
      .filter(col("other_id") < col("doc_id"))
    val hits = probe(idx).unionByName(probe(newPostings))
    val summary = hits.groupBy("doc_id")
      .agg(countDistinct(col("band"), col("bhash")).as("n_hit_bands"),
        min("other_id").as("anchor_id"))
    summary
      .join(batch.select(col("doc_id"), col("sig").as("sig_new")), "doc_id")
      .join(mergedSigs.select(col("doc_id").as("anchor_id"), col("sig").as("sig_old")),
        "anchor_id")
      .withColumn("est_jaccard", round(expr(
        "CAST(size(filter(zip_with(sig_new, sig_old, (x, y) -> x = y), v -> v)) AS DOUBLE) / 16D"), 4))
      .select("doc_id", "n_hit_bands", "anchor_id", "est_jaccard")
      .orderBy("doc_id")
  }

  /** Corpus-only connected-component labels over the PERSISTED band index
    * — the maintained cluster table of the daily-crawl pipeline, built
    * once per fixture and memoized. Built entirely from [[bandIndex]]'s
    * postings: anchor pairing needs only (doc_id, band, bhash), so the
    * corpus text is never re-shingled to maintain the clusters.
    */
  private val corpusCcMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Reusable per-(fixture, split) scratch dir for the per-batch delta
    * closure in [[incrementalClusters]] — overwritten, never re-allocated.
    */
  private val deltaCcMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def corpusClusterLabels(s: SparkSession, dir: String, batchMod: Int = 9): DataFrame = {
    val path = corpusCcMemo.computeIfAbsent(s"${docsFixtureKey(dir)}#m$batchMod", _ => {
      val out = graft.Scratch.dir("graft-corpus-cc-labels")
      val pairs = starEdges(bandIndex(s, dir, batchMod)._1).cache()
      try convergeLabels(s, pairs, out) finally pairs.unpersist()
      out
    })
    graft.Tables.loadPath(s, path)
  }

  /** Incremental near-dup cluster maintenance — the closure companion to
    * [[indexMaintenance]]: merge ONE batch into the persisted corpus
    * cluster labels without recomputing the corpus closure or touching
    * corpus text. Delta edges come from the merged postings restricted to
    * buckets the batch hits (star edges keeping only pairs with a batch
    * endpoint — connectivity-equivalent to the full-graph star, because a
    * bucket whose global anchor is a batch doc gets ALL its edges through
    * that anchor in the delta, and one whose anchor is corpus has its
    * corpus-corpus edges in the persisted closure already). Each delta
    * endpoint is CONTRACTED through the persisted labels (an old
    * component collapses to its label node — labels are component minima,
    * so the merged component's min-label is exactly the from-scratch
    * min), the tiny contracted graph runs the same convergence loop, and
    * the result relabels only affected components. Output is identical to
    * [[dedupClusters]] — the from-scratch DuckDB twin IS the oracle, so
    * hash equality proves incremental ≡ recompute.
    */
  /** The LAZY contracted delta-edge lineage of [[incrementalClusters]] —
    * the frame whose plan embodies the batch-only contract (shingles only
    * the batch slice, reads the persisted postings + labels, never the
    * corpus complement). Exposed un-checkpointed so PlanSpec can assert
    * the batch-only shape ON THE DELTA PATH itself (ADVICE r14 #3: the
    * final assembly plan can't witness it — the closure runs eagerly at
    * DataFrame construction).
    */
  private[graft] def incrementalClusterDelta(s: SparkSession, dir: String, batchMod: Int = 9)
      : DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val (idx, _) = bandIndex(s, dir, batchMod)
    val base = corpusClusterLabels(s, dir, batchMod)
    // plain lineage over the memoized cached batch — the old per-call
    // localCheckpoint materialized a fresh block set on every invocation
    // (ADVICE r14 #5); mhBanded over the cached sigs is one cheap explode
    val newPostings = mhBanded(batchSigs(s, dir, batchMod))
    // only buckets the batch touches can contribute delta edges. The
    // semi-join is SPLIT per side (same rewrite as the indexMaintenance
    // probe): the index leg semi-joins the bucketed table on exactly its
    // bucketing key, so the index side reads co-located — a union before
    // the semi-join would discard the bucketing and re-shuffle the whole
    // index per batch.
    val batchBuckets = newPostings.select("band", "bhash").distinct()
    val touched = idx.join(batchBuckets, Seq("band", "bhash"), "left_semi")
      .unionByName(
        newPostings.join(batchBuckets, Seq("band", "bhash"), "left_semi"))
    val delta = starEdges(touched)
      .filter(col("doc_a") % 10 === batchMod || col("doc_b") % 10 === batchMod)
    // contract endpoints through the persisted labels; batch ids are never
    // base labels (disjoint id spaces), so node identity is unambiguous
    delta
      .join(base.select(col("doc_id").as("doc_a"), col("label").as("la")),
        Seq("doc_a"), "left")
      .join(base.select(col("doc_id").as("doc_b"), col("label").as("lb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("na"),
        coalesce(col("lb"), col("doc_b")).as("nb"))
      .filter(col("na") =!= col("nb"))
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .distinct()
  }

  def incrementalClusters(s: SparkSession, dir: String, batchMod: Int = 9): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val base = corpusClusterLabels(s, dir, batchMod)
    val contracted = incrementalClusterDelta(s, dir, batchMod).localCheckpoint()
    // the delta-closure scratch dir is REUSED per (fixture, split) —
    // convergeLabels writes mode-overwrite, so repeated invocations (bench
    // best-of-N) recycle one directory instead of allocating a fresh one
    // per call (ADVICE r14 #5)
    val compOut = deltaCcMemo.computeIfAbsent(
      s"${docsFixtureKey(dir)}#m$batchMod", _ => graft.Scratch.dir("graft-delta-cc"))
    convergeLabels(s, contracted, compOut)
    val comp = s.read.parquet(compOut)
      .withColumnRenamed("doc_id", "node").withColumnRenamed("label", "comp")
    val baseLabelSet = base.select(col("label").as("node")).distinct()
    val labelNodes = comp.join(baseLabelSet, Seq("node"), "left_semi")
    val docNodes = comp.join(baseLabelSet, Seq("node"), "left_anti")
    // affected old components take their merged component's label; the
    // rest keep theirs; contracted nodes that are raw docs (batch docs or
    // previously-unclustered corpus docs) join fresh
    val relabeled = base
      .join(labelNodes.select(col("node").as("label"), col("comp")), Seq("label"))
      .select(col("doc_id"), col("comp").as("label"))
    val untouched = base
      .join(labelNodes.select(col("node").as("label")), Seq("label"), "left_anti")
      .select("doc_id", "label")
    val fresh = docNodes.select(col("node").as("doc_id"), col("comp").as("label"))
    relabeled.unionByName(untouched).unionByName(fresh)
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("label")))
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("label")).as("is_survivor"))
      .orderBy("doc_id")
  }

  /** Numeric census of the maintenance contract — the companion pin to
    * [[indexMaintenance]]: posting counts for the persisted index, the
    * batch delta, and the merged table, plus how many distinct band
    * buckets the batch actually hit and how many new docs collided. At
    * sf0.01 the probe itself emits a single collision row, so this census
    * is what makes the maintenance arithmetic (delta is batch-sized,
    * merged = index + delta, probe touches only hit buckets) hash-pinned
    * at the driver's gate scale. All five figures are exact integers; the
    * cross joins are 1-row scalar combines.
    */
  def indexMaintenanceCensus(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val (idx, _) = bandIndex(s, dir)
    // batch-sized, consumed three times below — derived from the shared
    // memoized cached batch frame (one cheap explode per consumer)
    val newPostings = mhBanded(batchSigs(s, dir))
    val nIdx = idx.agg(count(lit(1)).as("n_index_postings"))
    val nNew = newPostings.agg(count(lit(1)).as("n_batch_postings"))
    val nHit = newPostings.select("band", "bhash").distinct()
      .join(idx.select("band", "bhash").distinct(), Seq("band", "bhash"), "left_semi")
      .agg(count(lit(1)).as("n_hit_buckets"))
    // same split-probe shape as [[indexMaintenance]]: the index leg joins
    // the bucketed table on its bucketing key
    def collide(side: DataFrame): DataFrame = newPostings
      .join(side.withColumnRenamed("doc_id", "other_id"), Seq("band", "bhash"))
      .filter(col("other_id") < col("doc_id"))
      .select("doc_id")
    val nCollided = collide(idx).unionByName(collide(newPostings)).distinct()
      .agg(count(lit(1)).as("n_collided_new_docs"))
    nIdx.crossJoin(nNew).crossJoin(nHit).crossJoin(nCollided)
      .withColumn("n_merged_postings",
        col("n_index_postings") + col("n_batch_postings"))
      .select("n_index_postings", "n_batch_postings", "n_merged_postings",
        "n_hit_buckets", "n_collided_new_docs")
  }

  private val indexMaintenanceCensusSql =
    s"""WITH $lshCandCtes,
       |bb AS (SELECT DISTINCT band, bhash FROM banded WHERE doc_id % 10 = 9),
       |cb AS (SELECT DISTINCT band, bhash FROM banded WHERE doc_id % 10 <> 9),
       |np AS (SELECT count(*) AS n FROM banded WHERE doc_id % 10 = 9),
       |ip AS (SELECT count(*) AS n FROM banded WHERE doc_id % 10 <> 9),
       |hit AS (SELECT count(*) AS n FROM bb JOIN cb USING (band, bhash)),
       |coll AS (
       |  SELECT count(DISTINCT b.doc_id) AS n
       |  FROM banded b
       |  JOIN banded c ON c.band = b.band AND c.bhash = b.bhash AND c.doc_id < b.doc_id
       |  WHERE b.doc_id % 10 = 9)
       |SELECT CAST(ip.n AS BIGINT) AS n_index_postings,
       |  CAST(np.n AS BIGINT) AS n_batch_postings,
       |  CAST(ip.n + np.n AS BIGINT) AS n_merged_postings,
       |  CAST(hit.n AS BIGINT) AS n_hit_buckets,
       |  CAST(coll.n AS BIGINT) AS n_collided_new_docs
       |FROM ip, np, hit, coll""".stripMargin

  private val indexMaintenanceSql =
    s"""WITH $lshCandCtes,
       |hits AS (
       |  SELECT b.doc_id, b.band, b.bhash, c.doc_id AS other_id
       |  FROM banded b
       |  JOIN banded c ON c.band = b.band AND c.bhash = b.bhash AND c.doc_id < b.doc_id
       |  WHERE b.doc_id % 10 = 9
       |), summary AS (
       |  SELECT doc_id, CAST(count(DISTINCT (band, bhash)) AS BIGINT) AS n_hit_bands,
       |    min(other_id) AS anchor_id
       |  FROM hits GROUP BY doc_id
       |)
       |SELECT s.doc_id, n_hit_bands, anchor_id,
       |  round(CAST(len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) AS DOUBLE) / 16, 4)
       |    AS est_jaccard
       |FROM summary s
       |JOIN sigs sa ON s.doc_id = sa.doc_id
       |JOIN sigs sb ON s.anchor_id = sb.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** Memo key: dir + documents.parquet (mtime, size) — an in-place fixture
    * regeneration mid-JVM must invalidate the materialized labels, not
    * serve the previous corpus's clusters.
    */
  private def docsFixtureKey(dir: String): String = {
    val fp = try {
      val a = java.nio.file.Files.readAttributes(
        java.nio.file.Paths.get(dir, "documents.parquet"),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      s"${a.lastModifiedTime.toMillis}:${a.size}"
    } catch { case _: Throwable => "absent" }
    s"$dir@$fp"
  }

  private[graft] def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val path = ccLabelsMemo.computeIfAbsent(docsFixtureKey(dir), _ => {
      val out = graft.Scratch.dir("graft-cc-labels")
      computeClusterLabels(s, dir, out)
      out
    })
    graft.Tables.loadPath(s, path)
  }

  /** Runs the label propagation to convergence and writes the converged
    * (doc_id, label) table to `out`; every intermediate cache is released
    * before returning.
    */
  private def computeClusterLabels(s: SparkSession, dir: String, out: String): Unit = {
    // candidates only — skips minhashLsh's verify joins and global sort,
    // which the closure never looks at
    val docs = lshDocs(s, dir)
    val pairs = lshCandidates(docs).cache()
    try convergeLabels(s, pairs, out)
    finally {
      pairs.unpersist()
      docs.unpersist()
    }
  }

  /** Min-label propagation to convergence over an undirected pair graph
    * (cols doc_a, doc_b) — the shared CC loop behind [[clusterLabels]],
    * [[corpusClusterLabels]], and the per-batch delta closure in
    * [[incrementalClusters]]. Writes the converged (doc_id, label) table
    * to `out` and releases every intermediate cache before returning.
    */
  private def convergeLabels(s: SparkSession, pairs: DataFrame, out: String): Unit = {
    // the dup-pair graph is orders of magnitude smaller than the corpus
    // (LSH already pruned it); size the propagation's shuffle width to the
    // graph, not the corpus — the same "partitions follow state size" dial
    // as the streaming queries. Restored after the loop.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    var labels: DataFrame = null
    try {
      val edges = pairs
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      def propagate(l: DataFrame): DataFrame =
        edges.join(l, edges("doc_b") === l("doc_id"))
          .select(edges("doc_a").as("doc_id"), col("label"))
          .union(l) // own label participates in the min
          .groupBy("doc_id").agg(min("label").as("label"))
      labels = propagate( // 2 rounds composed LAZILY into one plan: every
        propagate( // Spark action costs a full job round-trip, so
          edges.select(col("doc_a").as("doc_id")) // convergence is checked
            .distinct() // once per 2 hops, not once per hop
            .withColumn("label", col("doc_id")))).cache()
      var rounds = 2
      var changed = propagate(labels).withColumnRenamed("label", "next_label")
        .join(labels, "doc_id")
        .filter(col("next_label") =!= col("label")).count()
      // near-dup components are near-cliques: 2 hops almost always closes
      // them, and the capped tail loop handles a pathological long chain
      // (failing loudly rather than looping forever)
      while (changed > 0 && rounds < 30) {
        val next = propagate(labels).cache()
        changed = next.withColumnRenamed("label", "next_label")
          .join(labels, "doc_id")
          .filter(col("next_label") =!= col("label")).count()
        labels.unpersist()
        labels = next
        rounds += 1
      }
      labels.write.mode("overwrite").parquet(out)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (labels != null) labels.unpersist()
    }
  }

  /** Oracle CTE chain ending in `comp(doc_id, cluster_id)` — the recursive
    * connected-components closure over the LSH candidates, shared with the
    * quality-survivor oracle in CurationQueries.
    */
  private[operators] val clusterCompCtes =
    s"""$lshCandCtes,
       |undirected AS (
       |  SELECT doc_a AS u, doc_b AS v FROM cand
       |  UNION ALL SELECT doc_b, doc_a FROM cand
       |), reach AS (
       |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM undirected)
       |  UNION
       |  SELECT e.u, reach.r FROM undirected e JOIN reach ON e.v = reach.u
       |), comp AS (
       |  SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u
       |)""".stripMargin

  private val dedupClustersSql =
    s"""WITH RECURSIVE $clusterCompCtes
       |SELECT doc_id, cluster_id,
       |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       |  doc_id = cluster_id AS is_survivor
       |FROM comp ORDER BY doc_id""".stripMargin

  /** Multi-pass sorted-neighborhood (sorted-fingerprint) near-dup
    * detection: each pass ranks the corpus in the total order of
    * (fingerprint key, doc_id) — near-identical docs share most shingles,
    * hence usually their extreme ones, so they land adjacent — and compares
    * each doc only against the next 3 in rank (exact shingle Jaccard
    * ≥ 0.2). Two passes with independent keys (min shingle, max shingle),
    * the classic multi-pass recall fix: a pair whose docs disagree on one
    * key usually agrees on the other. O(n log n) sort + O(n·w) comparisons
    * per pass; on the fixture the union recovers ALL brute-force pairs at
    * J ≥ 0.9 (pinned in PropertySpec).
    *
    * Scale shape: the GLOBAL rank is computed without a single-partition
    * window over the corpus — docs are bucketed by an order-preserving key
    * prefix, ranked per-bucket (bucket-keyed shuffle), and offset by the
    * cumulative counts of earlier buckets (a bucket-cardinality-sized frame,
    * broadcast back). Neighbor pairing is an EQUI-join on rank (each doc
    * probes rank+1..rank+3 via a 3-way explode) — no range join, no BNLJ;
    * PlanSpec pins the join shape.
    */
  def sortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // the shingled corpus feeds BOTH passes and, inside each pass, the
    // bucket census, the ranked frame, and both sides of the neighbor
    // self-join — materialize it once (optimization r17) instead of
    // re-tokenizing + re-shingling per consumer subtree
    // size-gated (r18): the shingled corpus is corpus-sized
    val docs = Materialize.gated(Tables.documents(s, dir),
      Tables.documents(s, dir)
        .withColumn("tk", expr(toks))
        .filter(size(col("tk")) >= 4)
        .withColumn("shingles", expr("word_shingles(tk, 4)"))
        .select("doc_id", "shingles"),
      "sneigh-docs")
    def pass(key: org.apache.spark.sql.Column): DataFrame = {
      val keyed = docs.withColumn("nkey", key)
      // order-preserving coarse bucket: ranks within bucket + cumulative
      // offsets of earlier buckets == rank in the global (nkey, doc_id)
      // order. The offsets window is single-partition ON THE BUCKET-COUNT
      // FRAME only (cardinality ≤ |prefix alphabet|²), never on the corpus.
      val bucketed = keyed.withColumn("bkt", substring(col("nkey"), 1, 2))
      val offsets = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(
          sum("cnt").over(Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("bkt", "off")
      val ranked = bucketed.join(broadcast(offsets), "bkt")
        .withColumn("rn",
          row_number().over(Window.partitionBy("bkt").orderBy("nkey", "doc_id")) + col("off"))
        .select("doc_id", "shingles", "rn")
      val probes = ranked.select(col("doc_id").as("doc_l"), col("shingles").as("sh_l"),
        explode(expr("array(rn + 1L, rn + 2L, rn + 3L)")).as("rn"))
      probes.join(ranked, "rn")
        .withColumn("jaccard", round(
          expr("""CAST(size(array_intersect(sh_l, shingles)) AS DOUBLE) /
                 |CAST(size(array_union(sh_l, shingles)) AS DOUBLE)""".stripMargin), 4))
        .filter(col("jaccard") >= 0.2)
        .select(least(col("doc_l"), col("doc_id")).as("doc_a"),
          greatest(col("doc_l"), col("doc_id")).as("doc_b"), col("jaccard"))
    }
    // same pair found by both passes carries the same exact Jaccard, so a
    // key-level distinct after the union is value-safe
    pass(array_min(col("shingles"))).union(pass(array_max(col("shingles"))))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  private val sortedNeighborhoodSql = {
    def passSql(key: String) =
      s"""  SELECT least(a.doc_id, b.doc_id) AS doc_a,
         |    greatest(a.doc_id, b.doc_id) AS doc_b,
         |    round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE), 4)
         |      AS jaccard
         |  FROM ordered_$key a JOIN ordered_$key b ON b.rn - a.rn BETWEEN 1 AND 3""".stripMargin
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3]))) AS shingles
       |  FROM (SELECT doc_id, $dToks AS tk FROM documents)
       |  WHERE len(tk) >= 4
       |), ordered_min AS (
       |  SELECT doc_id, shingles,
       |    row_number() OVER (ORDER BY list_min(shingles), doc_id) AS rn
       |  FROM sh
       |), ordered_max AS (
       |  SELECT doc_id, shingles,
       |    row_number() OVER (ORDER BY list_max(shingles), doc_id) AS rn
       |  FROM sh
       |), pairs AS (
       |${passSql("min")}
       |  UNION
       |${passSql("max")}
       |)
       |SELECT DISTINCT doc_a, doc_b, jaccard FROM pairs
       |WHERE jaccard >= 0.2 ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Substring-level duplication (token granularity, à la "Deduplicating
    * Training Data Makes Language Models Better": duplicated SPANS inside
    * otherwise-unique documents, which whole-doc dedup cannot see).
    * Positional 8-token shingles; a shingle occurring in ≥2 distinct docs
    * marks its [p, p+7] token interval as duplicated; overlapping/adjacent
    * intervals are consolidated per document (gaps-and-islands over a
    * running max(end)); output is per-doc consolidated span count, total
    * duplicated tokens, and the duplicated-token ratio. Scale shape: one
    * shingle-keyed shuffle for the cross-doc document frequency, one
    * doc-keyed window for interval merging — integer arithmetic end to
    * end, no all-pairs joins (the df side never expands, unlike the
    * Jaccard candidate join).
    */
  def substringSpans(s: SparkSession, dir: String): DataFrame = {
    // the positional shingle frame feeds BOTH the cross-doc document-
    // frequency census and the probe side of the dup-position join —
    // materialize it once (optimization r17) instead of re-running the
    // corpus explode + 8-token concat per consumer subtree
    // size-gated (r18): the positional shingle frame is corpus-sized
    val pos = Materialize.gated(Tables.documents(s, dir),
      Tables.documents(s, dir)
        .select(col("doc_id"), expr(toks).as("tk"))
        .filter(size(col("tk")) >= 8)
        .select(col("doc_id"), size(col("tk")).as("n_tok"),
          explode(expr("sequence(1, size(tk) - 7)")).as("p"),
          col("tk"))
        .withColumn("sh", expr("concat_ws(' ', slice(tk, p, 8))"))
        .drop("tk"),
      "spans-pos")
    val shared = pos.select("doc_id", "sh").distinct()
      .groupBy("sh").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    val dupPos = pos.join(shared, "sh").select("doc_id", "n_tok", "p")
    val wPrev = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, 0)
    dupPos
      .withColumn("prev_end", max(col("p") + 7).over(wPrev))
      .withColumn("new_island",
        when(col("prev_end").isNull || col("p") > col("prev_end") + 1, 1).otherwise(0))
      .withColumn("island", sum("new_island").over(wRun))
      .groupBy("doc_id", "n_tok", "island")
      .agg(min("p").as("span_start"), max(col("p") + 7).as("span_end"))
      .groupBy("doc_id", "n_tok")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
      .withColumn("dup_ratio", round(col("dup_tokens").cast("double") / col("n_tok"), 4))
      .select("doc_id", "n_tok", "n_spans", "dup_tokens", "dup_ratio")
      .orderBy("doc_id")
  }

  private val substringSpansSql =
    s"""WITH pos AS (
       |  SELECT doc_id, CAST(len(tk) AS INT) AS n_tok, CAST(p AS INT) AS p,
       |    array_to_string(tk[p:p + 7], ' ') AS sh
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS p
       |        FROM (SELECT doc_id, $dToks AS tk FROM documents)
       |        WHERE len(tk) >= 8)
       |), shared AS (
       |  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM pos)
       |  GROUP BY sh HAVING count(*) >= 2
       |), dup_pos AS (
       |  SELECT doc_id, n_tok, p FROM pos JOIN shared USING (sh)
       |), islands AS (
       |  SELECT doc_id, n_tok, p,
       |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM (
       |    SELECT doc_id, n_tok, p,
       |      CASE WHEN prev_end IS NULL OR p > prev_end + 1 THEN 1 ELSE 0 END AS new_island
       |    FROM (
       |      SELECT doc_id, n_tok, p,
       |        max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |      FROM dup_pos))
       |), spans AS (
       |  SELECT doc_id, n_tok, island,
       |    min(p) AS span_start, max(p + 7) AS span_end
       |  FROM islands GROUP BY 1, 2, 3)
       |SELECT doc_id, n_tok, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
       |  round(CAST(sum(span_end - span_start + 1) AS DOUBLE) / n_tok, 4) AS dup_ratio
       |FROM spans GROUP BY doc_id, n_tok ORDER BY doc_id""".stripMargin

  /** SemDeDup-style semantic dedup: embeddings are assigned to their
    * nearest learned centroid (the label centroids double as the k-means
    * codebook — the same deterministic coarse quantizer the IVF query
    * uses), then within each cluster a vector is a duplicate if its cosine
    * to any LOWER-id cluster-mate reaches τ = 0.3 (keep-first-seen, the
    * deterministic greedy rule). Scale shape: the codebook is broadcast;
    * pair generation is cluster-blocked (never corpus-wide); the per-vector
    * "max cosine to a prior mate" is one cluster-keyed aggregation.
    */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    graft.functions.GraftFunctions.register(s)
    val centroidUdaf = udaf(new graft.functions.VectorCentroid, ExpressionEncoder[Seq[Float]]())
    val e = Tables.embeddings(s, dir)
    val centroids = e.groupBy("label")
      .agg(centroidUdaf(col("embedding")).as("centroid_d"))
      .withColumn("centroid", expr("transform(centroid_d, x -> CAST(x AS FLOAT))"))
      .select(col("label").as("c_id"), col("centroid"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("c_cos"), asc("c_id"))
    // cached: consumed three times (both pair sides + the final join) —
    // without it each consumer re-runs the centroid agg and the broadcast
    // assign; at cluster scale this is the checkpointed assignment frame
    val assigned = e.join(broadcast(centroids), lit(true))
      .withColumn("c_cos", expr("cosine_sim(embedding, centroid)"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("cluster"))
      .cache()
    val a = assigned.select(col("cluster").as("cluster_a"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = assigned.select(col("cluster").as("cluster_b"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val maxPrior = a.join(b, col("cluster_a") === col("cluster_b") && col("id_a") < col("id_b"))
      .withColumn("cos", expr("cosine_sim(emb_a, emb_b)"))
      .groupBy(col("id_b").as("vec_id"))
      .agg(max("cos").as("max_prior_cos"))
    assigned.join(maxPrior, Seq("vec_id"), "left")
      .withColumn("max_prior_cos", round(coalesce(col("max_prior_cos"), lit(-1d)), 4))
      .withColumn("is_dup", col("max_prior_cos") >= 0.3)
      .select("cluster", "vec_id", "max_prior_cos", "is_dup")
      .orderBy("cluster", "vec_id")
  }

  private val semanticDedupSql = {
    val cosEC =
      """list_sum(list_transform(list_zip(e.embedding, c.centroid),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(c.centroid, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    val cosAB =
      """list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    s"""WITH centroids AS (
       |  SELECT label AS c_id,
       |    list_transform(list(avg_v ORDER BY dim), x -> CAST(x AS FLOAT)) AS centroid
       |  FROM (
       |    SELECT label, dim, avg(CAST(v AS DOUBLE)) AS avg_v
       |    FROM (SELECT label, unnest(embedding) AS v,
       |            generate_subscripts(embedding, 1) AS dim
       |          FROM embeddings)
       |    GROUP BY label, dim)
       |  GROUP BY label
       |), assigned AS (
       |  SELECT vec_id, embedding, c_id AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $cosEC DESC, c.c_id ASC) AS arn
       |    FROM embeddings e CROSS JOIN centroids c)
       |  WHERE arn = 1
       |), mp AS (
       |  SELECT b.vec_id, max($cosAB) AS max_prior_cos
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  GROUP BY 1)
       |SELECT cluster, vec_id,
       |  round(coalesce(max_prior_cos, -1), 4) AS max_prior_cos,
       |  round(coalesce(max_prior_cos, -1), 4) >= 0.3 AS is_dup
       |FROM assigned LEFT JOIN mp USING (vec_id)
       |ORDER BY cluster, vec_id""".stripMargin
  }

  /** Incremental (cross-snapshot) dedup — the production ingest shape:
    * today's batch (doc_id % 10 = 9 stands in for the new crawl) is
    * deduplicated AGAINST the standing corpus, not within itself. Two
    * gates, mirroring how a real pipeline stages them: (1) exact content
    * hash — a semi-join of the batch against the corpus hash set (at
    * 100 TB the corpus side is a bucketed hash table; nothing rescans the
    * corpus text); (2) for exact-survivors only, near-dup via the shared
    * df-capped shingle inverted index, batch-side shingles joined against
    * corpus-side shingles (never corpus×corpus — the index is keyed by
    * shingle, so the incremental join touches only buckets the batch
    * actually hits), Jaccard ≥ 0.5 drops. Per-source accounting reports
    * each gate's yield.
    */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("content_hash",
        sha2(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary"), 256))
      .withColumn("is_new", col("doc_id") % 10 === 9)
      .cache() // consumed by both halves + final accounting
    val corpus = docs.filter(!col("is_new"))
    val batch = docs.filter(col("is_new"))
    val exactDup = batch.join(
      corpus.select("content_hash").distinct(), Seq("content_hash"), "left_semi")
      .select("doc_id")
    val survivors = batch.join(exactDup.withColumnRenamed("doc_id", "dup_id"),
      col("doc_id") === col("dup_id"), "left_anti")
    // corpus leg, batch leg, and counts all read sh: one materialization
    // (optimization r17), size-gated (r18) — corpus-sized frame
    val sh = Materialize.gated(Tables.documents(s, dir),
      shingleFrame(s, dir)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .filter(col("df") <= MaxShingleDf)
        .select("doc_id", "shingle"),
      "incr-sh")
    val shCorpus = sh.join(corpus.select("doc_id"), "doc_id")
      .withColumnRenamed("doc_id", "corpus_id")
    val shBatch = sh.join(survivors.select("doc_id"), "doc_id")
      .withColumnRenamed("doc_id", "batch_id")
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val nearDup = shBatch.join(shCorpus, "shingle")
      .groupBy("batch_id", "corpus_id").agg(count(lit(1)).as("inter"))
      .join(counts.withColumnRenamed("doc_id", "batch_id").withColumnRenamed("n_sh", "n_a"), "batch_id")
      .join(counts.withColumnRenamed("doc_id", "corpus_id").withColumnRenamed("n_sh", "n_b"), "corpus_id")
      .filter(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")) >= 0.5)
      .select(col("batch_id").as("doc_id")).distinct()
    val flagged = batch
      .join(exactDup.withColumn("exact_dup", lit(1)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("near_dup", lit(1)), Seq("doc_id"), "left")
    val out = flagged.groupBy("source")
      .agg(count(lit(1)).as("n_new"),
        sum(coalesce(col("exact_dup"), lit(0))).as("n_exact_dup"),
        sum(coalesce(col("near_dup"), lit(0))).as("n_near_dup"),
        sum(when(col("exact_dup").isNull && col("near_dup").isNull, 1)
          .otherwise(0)).as("n_kept"))
      .orderBy("source")
    // eager: per-source accounting is a handful of rows, so materializing
    // here lets the corpus-wide docs cache be released immediately instead
    // of outliving the query across a long sweep
    try {
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally docs.unpersist()
  }

  private val incrementalDedupSql =
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
       |    doc_id % 10 = 9 AS is_new
       |  FROM documents
       |), exact_dup AS (
       |  SELECT b.doc_id FROM docs b
       |  WHERE b.is_new AND b.content_hash IN (
       |    SELECT content_hash FROM docs WHERE NOT is_new)
       |), sh_raw AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3])))) AS shingle
       |  FROM (SELECT doc_id, $dToks AS tk FROM documents)
       |  WHERE len(tk) >= 4
       |), sh AS (
       |  SELECT doc_id, shingle FROM (
       |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
       |    FROM sh_raw)
       |  WHERE df <= $MaxShingleDf
       |), counts AS (
       |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
       |), near_dup AS (
       |  SELECT DISTINCT sb.doc_id
       |  FROM sh sb
       |  JOIN docs db ON db.doc_id = sb.doc_id AND db.is_new
       |    AND sb.doc_id NOT IN (SELECT doc_id FROM exact_dup)
       |  JOIN sh sc ON sc.shingle = sb.shingle
       |  JOIN docs dc ON dc.doc_id = sc.doc_id AND NOT dc.is_new
       |  JOIN counts ca ON ca.doc_id = sb.doc_id
       |  JOIN counts cb ON cb.doc_id = sc.doc_id
       |  GROUP BY sb.doc_id, sc.doc_id, ca.n_sh, cb.n_sh
       |  HAVING CAST(count(*) AS DOUBLE) / (ca.n_sh + cb.n_sh - count(*)) >= 0.5
       |), flagged AS (
       |  SELECT d.doc_id, d.source,
       |    CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS exact_dup,
       |    CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END AS near_dup
       |  FROM docs d
       |  LEFT JOIN exact_dup e ON e.doc_id = d.doc_id
       |  LEFT JOIN near_dup n ON n.doc_id = d.doc_id
       |  WHERE d.is_new)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_new,
       |  CAST(sum(exact_dup) AS BIGINT) AS n_exact_dup,
       |  CAST(sum(near_dup) AS BIGINT) AS n_near_dup,
       |  CAST(sum(CASE WHEN exact_dup = 0 AND near_dup = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM flagged GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // Content-defined chunking (gear/rolling-hash CDC — the dedup
  // technique rsync/LBFS/restic-class systems and byte-level corpus
  // dedup use): chunk boundaries fall where the rolling hash of the
  // trailing 8 characters hits 0 mod 64, so an insertion early in a
  // document only reshapes the chunks AROUND the edit — fixed-width
  // blocks would shift every subsequent block and defeat dedup. The
  // hash is the repo's established polynomial (Σ c·31^k mod 1000003,
  // exact integer on both engines), chunk identity is md5 of the chunk
  // text, and cross-document sharing is one chunk-hash-keyed
  // aggregation. The boundary scan is the native rolling-hash kernel
  // `cdc_boundaries` (functions/TokenFunctions.scala): O(1) per position
  // via the multiply-subtract recurrence, codegen'd, value-identical to
  // the O(8)-per-position HOF fold the DuckDB oracle still replays.
  // Everything else is embarrassingly parallel per document + one keyed
  // shuffle.
  // ------------------------------------------------------------------
  def cdcChunks(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .filter(length(col("text")) >= 8)
      .withColumn("n", length(col("text")))
      // boundary positions: i in [8, n) where hash(text[i-7..i]) % 64 == 0
      // (the final position n never opens an empty tail chunk; the kernel
      // returns an empty array at n = 8, matching the oracle's empty
      // ascending range there).
      .withColumn("bounds", expr("cdc_boundaries(text)"))
      .withColumn("starts", expr(
        "concat(array(1), transform(bounds, i -> i + 1))"))
      .withColumn("ends", expr(
        "concat(bounds, array(n))"))
      .withColumn("chunks", expr(
        """transform(arrays_zip(starts, ends),
          |  p -> named_struct('len', CAST(p.ends - p.starts + 1 AS BIGINT),
          |    'h', md5(substr(text, p.starts, p.ends - p.starts + 1))))"""
          .stripMargin))
      .select(col("doc_id"), col("chunks"))
    // size-gated (r18): the chunk frame is corpus-sized
    val docsM = Materialize.gated(Tables.documents(s, dir), docs, "cdc-chunks")
    val exploded = docsM.select(col("doc_id"),
      explode(col("chunks")).as("c")).select(col("doc_id"), col("c.len"), col("c.h"))
    val docFreq = exploded.select(col("h"), col("doc_id")).distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
    exploded.join(docFreq, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("h")).as("n_distinct_chunks"),
        countDistinct(when(col("df") > 1, col("h"))).as("n_shared_chunks"),
        max("len").as("max_chunk_len"))
      .orderBy("doc_id")
  }

  private val cdcChunksSql =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n FROM documents
      |  WHERE length(text) >= 8),
      |b AS (
      |  SELECT doc_id, text, n,
      |    list_filter(list_transform(range(8, n),
      |      i -> {'i': i, 'h': list_reduce(
      |        list_concat([CAST(0 AS BIGINT)],
      |          list_transform(range(i - 7, i + 1),
      |            j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
      |        (a, c) -> (a * 31 + c) % 1000003)}),
      |      e -> e.h % 64 = 0) AS bounds
      |  FROM d),
      |ch AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(bounds) + 2),
      |    k -> {'len': CAST(
      |        (CASE WHEN k <= len(bounds) THEN bounds[CAST(k AS INT)]['i'] ELSE n END)
      |        - (CASE WHEN k = 1 THEN 1 ELSE bounds[CAST(k - 1 AS INT)]['i'] + 1 END)
      |        + 1 AS BIGINT),
      |      'h': md5(substr(text,
      |        CAST(CASE WHEN k = 1 THEN 1
      |          ELSE bounds[CAST(k - 1 AS INT)]['i'] + 1 END AS INT),
      |        CAST((CASE WHEN k <= len(bounds) THEN bounds[CAST(k AS INT)]['i'] ELSE n END)
      |          - (CASE WHEN k = 1 THEN 1
      |             ELSE bounds[CAST(k - 1 AS INT)]['i'] + 1 END) + 1 AS INT)))}))
      |    AS c
      |  FROM b),
      |e AS (SELECT doc_id, c['len'] AS len, c['h'] AS h FROM ch),
      |df AS (
      |  SELECT h, CAST(count(*) AS BIGINT) AS df FROM (
      |    SELECT DISTINCT h, doc_id FROM e) GROUP BY 1)
      |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(count(DISTINCT e.h) AS BIGINT) AS n_distinct_chunks,
      |  CAST(count(DISTINCT CASE WHEN df > 1 THEN e.h END) AS BIGINT)
      |    AS n_shared_chunks,
      |  CAST(max(len) AS BIGINT) AS max_chunk_len
      |FROM e JOIN df ON e.h = df.h
      |GROUP BY 1 ORDER BY e.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // LSH band tuning: before re-sharding a 100 TB dedup run, which
  // (bands, rows) split of the 16-component signature should it use?
  // The S-curve P(s) = 1 − (1−sʳ)ᵇ is evaluated at the OBSERVED exact
  // Jaccard of the current candidate pairs for every alternative split
  // (16×1, 8×2, 4×4, 2×8), giving the expected catch mass among
  // high-sim (s ≥ 0.5) and low-sim pairs per config — the measured
  // version of the textbook threshold table. Determinism: sʳ and
  // (1−sʳ)ᵇ are GENERATED power-of-two multiplication chains (never
  // runtime pow — fractional pow differs across engines); each pair's
  // P lands in exact micro-units via floor(P·10⁶) so the per-config
  // sums are plain BIGINT aggregation — distribution-safe at any
  // scale, no ordered fold needed. The s₅₀ midpoints are shared
  // precomputed literals (the ln-literal discipline). Scale shape:
  // same broadcast-verify join as minhashLsh, then one 4-way unpivot
  // of a single aggregate row.
  // ------------------------------------------------------------------
  //
  // (1 − sʳ)ᵇ with r, b powers of two, rendered as nested squarings on
  // a column reference — identical arithmetic in Spark and DuckDB.
  private def pCatch(b: Int, r: Int): String = {
    def pow2(e: String, k: Int): String =
      if (k == 1) e else { val h = pow2(e, k / 2); s"($h * $h)" }
    val sr = pow2("s", r)
    s"(1.0 - ${pow2(s"(1.0 - $sr)", b)})"
  }
  private val bandConfigs = Seq((16, 1, "0.042397"), (8, 2, "0.28809"),
    (4, 4, "0.631568"), (2, 8, "0.857706"))

  def lshBandTuning(s: SparkSession, dir: String): DataFrame = {
    val docs = lshDocs(s, dir)
    val cand = lshCandidates(docs)
    val withA = docs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
      .join(broadcast(cand), "doc_a")
    val pairs = docs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
      .join(broadcast(withA), "doc_b")
      .select(
        expr("size(array_intersect(sh_a, sh_b))").cast("long").as("inter"),
        expr("size(array_union(sh_a, sh_b))").cast("long").as("uni"))
      .withColumn("s", expr("CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)"))
      .withColumn("hi", expr("2 * inter >= uni")) // s ≥ 0.5, integer-decided
    val sumCols = sum(when(col("hi"), 1L).otherwise(0L)).as("n_high") +:
      sum(when(!col("hi"), 1L).otherwise(0L)).as("n_low") +:
      bandConfigs.flatMap { case (b, r, _) =>
        val p = pCatch(b, r)
        Seq(
          sum(expr(s"CASE WHEN hi THEN CAST(floor($p * 1000000.0) AS BIGINT) ELSE 0L END"))
            .as(s"hi_${b}x$r"),
          sum(expr(s"CASE WHEN NOT hi THEN CAST(floor($p * 1000000.0) AS BIGINT) ELSE 0L END"))
            .as(s"lo_${b}x$r"))
      }
    val sums = pairs.agg(sumCols.head, sumCols.tail: _*)
    val stack = bandConfigs.map { case (b, r, s50) =>
      s"'${b}x$r', ${b}L, ${r}L, CAST($s50 AS DOUBLE), hi_${b}x$r, lo_${b}x$r"
    }.mkString(", ")
    sums.selectExpr("n_high", "n_low",
      s"stack(4, $stack) AS (config, bands, rows_per_band, s50, hi_micro, lo_micro)")
      .select(col("config"), col("bands"), col("rows_per_band"), col("s50"),
        col("n_high"), col("n_low"),
        round(col("hi_micro").cast("double") / 1e6, 4).as("exp_catch_high"),
        round(col("lo_micro").cast("double") / 1e6, 4).as("exp_catch_low"))
      .orderBy(col("bands").desc)
  }

  private val lshBandTuningSql = {
    val catches = bandConfigs.flatMap { case (b, r, _) =>
      val p = pCatch(b, r)
      Seq(
        s"CAST(sum(CASE WHEN hi THEN CAST(floor($p * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS hi_${b}x$r",
        s"CAST(sum(CASE WHEN NOT hi THEN CAST(floor($p * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS lo_${b}x$r")
    }.mkString(", ")
    val rows = bandConfigs.map { case (b, r, s50) =>
      s"SELECT '${b}x$r' AS config, CAST($b AS BIGINT) AS bands, " +
        s"CAST($r AS BIGINT) AS rows_per_band, CAST($s50 AS DOUBLE) AS s50, " +
        s"n_high, n_low, round(CAST(hi_${b}x$r AS DOUBLE) / 1e6, 4) AS exp_catch_high, " +
        s"round(CAST(lo_${b}x$r AS DOUBLE) / 1e6, 4) AS exp_catch_low FROM sums"
    }.mkString(" UNION ALL ")
    s"""WITH $lshCandCtes,
       |pairs AS (
       |  SELECT CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
       |    CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS BIGINT) AS uni
       |  FROM cand JOIN sigs sa ON doc_a = sa.doc_id JOIN sigs sb ON doc_b = sb.doc_id),
       |scored AS (
       |  SELECT CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS s,
       |    2 * inter >= uni AS hi
       |  FROM pairs),
       |sums AS (
       |  SELECT CAST(sum(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       |    CAST(sum(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       |    $catches
       |  FROM scored)
       |SELECT * FROM ($rows) ORDER BY bands DESC""".stripMargin
  }

  // ------------------------------------------------------------------
  // LSH recall evaluation: does the banded minhash ACTUALLY catch the
  // near-duplicates the exact n-gram pass finds? — the measured ground
  // truth for what [[lshBandTuning]] predicts analytically, and the
  // number a dedup deployment must monitor before trusting sketches at
  // 100 TB. Truth = source-blocked capped-shingle pairs with exact
  // Jaccard ≥ 0.5 (integer-decided: 2·|∩| ≥ |∪|; the ≥ 0.7 band
  // 10·|∩| ≥ 7·|∪| reported separately — banding theory says recall
  // there should be near 1). Candidates = the production lshCandidates
  // set. Recall ratios are the only doubles, derived from exact
  // censuses. Scale shape: both sides are the existing bounded
  // pipelines; the recall join is pair-keyed.
  // ------------------------------------------------------------------
  def lshRecallEval(s: SparkSession, dir: String): DataFrame = {
    // counts + both truth-join sides: one materialization (optimization
    // r17), size-gated (r18) — corpus-sized frame
    val sh = Materialize.gated(Tables.documents(s, dir),
      shingleFrame(s, dir)
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy("source", "shingle")))
        .filter(col("df") <= MaxShingleDf)
        .drop("df"),
      "lshrec-sh")
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("source"), col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("source").as("source_b"), col("doc_id").as("doc_b"),
      col("shingle").as("shingle_b"))
    val inter = a.join(b,
        col("source") === col("source_b") && col("shingle") === col("shingle_b") &&
          col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    val truth = inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(lit(2L) * col("inter") >= col("uni"))
      .withColumn("hi", lit(10L) * col("inter") >= lit(7L) * col("uni"))
    val cand = lshCandidates(lshDocs(s, dir)).withColumn("caught", lit(1L))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("caught"), lit(0L))).as("n_caught"),
        sum(when(col("hi"), 1L).otherwise(0L)).as("n_truth_hi"),
        sum(when(col("hi"), coalesce(col("caught"), lit(0L))).otherwise(0L))
          .as("n_caught_hi"))
      .crossJoin(broadcast(nCand))
      .select(col("n_truth"), col("n_caught"),
        round(col("n_caught").cast("double") / col("n_truth").cast("double"), 4)
          .as("recall"),
        col("n_truth_hi"), col("n_caught_hi"),
        round(col("n_caught_hi").cast("double") / col("n_truth_hi").cast("double"), 4)
          .as("recall_hi"),
        col("n_candidates"))
  }

  private val lshRecallEvalSql =
    s"""WITH $lshCandCtes,
       |sh_raw AS (
       |  SELECT doc_id, source, unnest(list_distinct(list_transform(
       |    range(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3])))) AS shingle
       |  FROM (SELECT doc_id, source, $dToks AS tk FROM documents)
       |  WHERE len(tk) >= 4),
       |sh AS (
       |  SELECT doc_id, source, shingle FROM (
       |    SELECT doc_id, source, shingle,
       |      count(*) OVER (PARTITION BY source, shingle) AS df
       |    FROM sh_raw)
       |  WHERE df <= 50),
       |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.source = b.source AND a.shingle = b.shingle
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT doc_a, doc_b, inter, ca.n_sh + cb.n_sh - inter AS uni
       |  FROM inter JOIN counts ca ON doc_a = ca.doc_id
       |  JOIN counts cb ON doc_b = cb.doc_id
       |  WHERE 2 * inter >= ca.n_sh + cb.n_sh - inter),
       |flag AS (
       |  SELECT t.doc_a, t.doc_b, 10 * inter >= 7 * uni AS hi,
       |    CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS caught
       |  FROM truth t LEFT JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_truth,
       |    CAST(sum(caught) AS BIGINT) AS n_caught,
       |    CAST(sum(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_truth_hi,
       |    CAST(sum(CASE WHEN hi THEN caught ELSE 0 END) AS BIGINT) AS n_caught_hi
       |  FROM flag),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand)
       |SELECT n_truth, n_caught,
       |  round(CAST(n_caught AS DOUBLE) / CAST(n_truth AS DOUBLE), 4) AS recall,
       |  n_truth_hi, n_caught_hi,
       |  round(CAST(n_caught_hi AS DOUBLE) / CAST(n_truth_hi AS DOUBLE), 4) AS recall_hi,
       |  n_candidates
       |FROM agg, nc""".stripMargin

  /** Template-boundary grouping: documents sharing identical FIRST-2 and
    * LAST-1 token boundaries — the cheap structural-near-dup detector for
    * templated/boilerplate-framed content (mirror pages, scraped
    * listings, generated reports whose frame is fixed and whose middle
    * varies), run before any shingle-level pass because it is one linear
    * projection + one hash-agg. Only multi-doc groups are emitted, with
    * the earliest member as the exemplar — the survivorship convention
    * every dedup family here shares. Scale shape: corpus-linear, one
    * exchange on the (head, tail) key; the boundary key is tiny and
    * uniformly hashable, so no skew mitigation is needed.
    */
  def templateBoundaries(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("tk", expr(toks))
      .filter(size(col("tk")) >= 6) // head and tail must not overlap
      .select(col("doc_id"),
        concat_ws(" ", expr("slice(tk, 1, 2)")).as("head"),
        concat_ws(" ", expr("slice(tk, -1, 1)")).as("tail"))
      .groupBy("head", "tail")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("exemplar_id"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), asc("head"), asc("tail"))

  private val templateBoundariesSql =
    s"""WITH t AS (
       |  SELECT doc_id, $dToks AS tk FROM documents
       |), b AS (
       |  SELECT doc_id,
       |    array_to_string(tk[1:2], ' ') AS head,
       |    array_to_string(tk[-1:], ' ') AS tail
       |  FROM t WHERE len(tk) >= 6)
       |SELECT head, tail, CAST(count(*) AS BIGINT) AS n_docs,
       |  min(doc_id) AS exemplar_id
       |FROM b GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY n_docs DESC, head, tail""".stripMargin

  /** Near-dup impact report — the dashboard a data-engineering team
    * reads after a dedup run: per source, how many documents sit in
    * near-dup clusters, how many would be REMOVED under
    * keep-the-survivor, and the token mass that removal reclaims. Built
    * from the persisted cluster labels ([[clusterLabels]]) joined once
    * against a per-doc token census — no re-clustering, no text
    * re-processing; the oracle replays the from-scratch closure. Scale
    * shape: one corpus-linear token count, one broadcast-sized label
    * join (the dup-pair graph is corpus-density-bounded), one source agg.
    */
  def dedupImpact(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(expr(toks)).cast("long").as("n_tokens"))
    val labels = clusterLabels(s, dir)
    docs.join(labels, Seq("doc_id"), "left")
      .withColumn("is_dup_member", col("label").isNotNull)
      .withColumn("is_removed", col("label").isNotNull && col("doc_id") =!= col("label"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_dup_member").cast("long")).as("n_cluster_members"),
        sum(col("is_removed").cast("long")).as("n_removed"),
        sum("n_tokens").as("tokens_total"),
        sum(when(col("is_removed"), col("n_tokens")).otherwise(0L)).as("tokens_removed"))
      .select(col("source"), col("n_docs"), col("n_cluster_members"),
        col("n_removed"), col("tokens_total"), col("tokens_removed"),
        round(col("n_removed").cast("double") / col("n_docs").cast("double"), 4)
          .as("doc_removal_rate"),
        round(col("tokens_removed").cast("double") / col("tokens_total").cast("double"), 4)
          .as("token_removal_rate"))
      .orderBy("source")
  }

  private val dedupImpactSql =
    s"""WITH RECURSIVE $clusterCompCtes,
       |toks AS (
       |  SELECT doc_id, source,
       |    CAST(len($dToks) AS BIGINT) AS n_tokens
       |  FROM documents
       |), joined AS (
       |  SELECT t.source, t.n_tokens,
       |    c.doc_id IS NOT NULL AS is_member,
       |    c.doc_id IS NOT NULL AND t.doc_id <> c.cluster_id AS is_removed
       |  FROM toks t LEFT JOIN comp c ON t.doc_id = c.doc_id)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_cluster_members,
       |  CAST(sum(CASE WHEN is_removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       |  CAST(sum(CASE WHEN is_removed THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_removed,
       |  round(CAST(sum(CASE WHEN is_removed THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 4) AS doc_removal_rate,
       |  round(CAST(sum(CASE WHEN is_removed THEN n_tokens ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(n_tokens) AS DOUBLE), 4) AS token_removal_rate
       |FROM joined GROUP BY source ORDER BY source""".stripMargin

  /** Contrastive training-pair mining — the (anchor, positive, hard
    * negative) triplets an embedding-model trainer consumes: every
    * non-survivor member of a near-dup cluster pairs with its cluster's
    * survivor as the POSITIVE (near-duplicates are semantically
    * interchangeable), and its hard NEGATIVE is the closest-length
    * same-source document OUTSIDE its cluster from the same length
    * bucket — superficially similar (same provenance, same size) but not
    * a duplicate, which is exactly what makes it hard. Blocking on
    * (source, n_chars div 16) keeps candidate fan-out bucket-bounded (no
    * same-source all-pairs); ranking is (|Δchars| asc, candidate id asc)
    * — fully deterministic. Scale shape: the mining side is the dup
    * membership (corpus-density-bounded, broadcast); candidates come
    * from one keyed join on the block key.
    */
  def contrastivePairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (col("n_chars") / 16).cast("long").as("len_bucket"))
    val labels = clusterLabels(s, dir)
    val mining = docs.join(labels, "doc_id")
      .filter(col("doc_id") =!= col("label"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("len_bucket"), col("label").as("pos_id"))
    val cands = docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id").as("cand_id"), col("source"),
        col("n_chars").as("cand_chars"), col("len_bucket"),
        col("label").as("cand_label"))
    val wN = Window.partitionBy("doc_id")
      .orderBy(abs(col("cand_chars") - col("n_chars")).asc, col("cand_id").asc)
    mining.join(cands, Seq("source", "len_bucket"))
      .filter(col("cand_id") =!= col("doc_id") &&
        (col("cand_label").isNull || col("cand_label") =!= col("pos_id")))
      .withColumn("rn", row_number().over(wN))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("pos_id"), col("cand_id").as("neg_id"),
        abs(col("cand_chars") - col("n_chars")).cast("long").as("neg_char_gap"))
      .orderBy("doc_id")
  }

  private val contrastivePairsSql =
    s"""WITH RECURSIVE $clusterCompCtes,
       |d AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(n_chars // 16 AS BIGINT) AS len_bucket
       |  FROM documents
       |), mining AS (
       |  SELECT d.doc_id, d.source, d.n_chars, d.len_bucket,
       |    c.cluster_id AS pos_id
       |  FROM d JOIN comp c USING (doc_id)
       |  WHERE d.doc_id <> c.cluster_id
       |), cands AS (
       |  SELECT d.doc_id AS cand_id, d.source, d.n_chars AS cand_chars,
       |    d.len_bucket, c.cluster_id AS cand_label
       |  FROM d LEFT JOIN comp c USING (doc_id)
       |), ranked AS (
       |  SELECT m.doc_id, m.pos_id, k.cand_id,
       |    abs(k.cand_chars - m.n_chars) AS gap,
       |    row_number() OVER (PARTITION BY m.doc_id
       |      ORDER BY abs(k.cand_chars - m.n_chars) ASC, k.cand_id ASC) AS rn
       |  FROM mining m JOIN cands k USING (source, len_bucket)
       |  WHERE k.cand_id <> m.doc_id
       |    AND (k.cand_label IS NULL OR k.cand_label <> m.pos_id))
       |SELECT doc_id, pos_id, cand_id AS neg_id,
       |  CAST(gap AS BIGINT) AS neg_char_gap
       |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Per-doc core of [[paragraphRebuild]], exposed so InvariantSpec can pin
    * the reconstruction law on the full frame (an untouched doc must
    * round-trip byte-identical, not just count-identical).
    *
    * Columns: doc_id, n_paras, n_removed, chars_removed, rebuilt.
    */
  private[graft] def paragraphRebuildPerDoc(s: SparkSession, dir: String): DataFrame = {
    val paras = Tables.documents(s, dir)
      .withColumn("tk", expr(toks))
      .filter(size(col("tk")) >= 1)
      // fixed 8-word windows play "paragraphs" (the fixture text carries
      // no newline structure); position g is the reassembly key
      .withColumn("g",
        explode(sequence(lit(0L), ceil(size(col("tk")) / lit(8.0)).cast("long") - 1)))
      .select(col("doc_id"), col("g"),
        array_join(slice(col("tk"), (col("g") * 8 + 1).cast("int"), lit(8)), " ").as("para"))
    // canonical occurrence = (min doc_id, then min position) — one
    // shuffle on the paragraph content; groups are duplicate-count sized
    val ranked = paras.withColumn("rn",
      row_number().over(Window.partitionBy("para").orderBy(asc("doc_id"), asc("g"))))
    ranked.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("rn") > 1, length(col("para")).cast("long")).otherwise(0L))
          .as("chars_removed"),
        // order-free reassembly (the curation_bpe_tokenize shape):
        // collect the SURVIVING (g, para) pairs, sort by position, join —
        // deterministic under any shuffle order
        array_join(transform(
          array_sort(collect_list(when(col("rn") === 1, struct(col("g"), col("para"))))),
          x => x.getField("para")), " ").as("rebuilt"))
  }

  /** Paragraph-level exact dedup WITH document reconstruction — the
    * RefinedWeb/MassiveText production move the doc-level family lacked
    * (VERDICT r15 "what's missing" #1): split every document into
    * position-keyed paragraphs, exact-dedup paragraphs CORPUS-WIDE
    * keeping the canonical first occurrence (min doc_id, then min
    * position), then REASSEMBLE each document from its surviving
    * paragraphs in original order, reporting per-source removal
    * accounting. `docs_roundtrip_exact` counts untouched docs whose
    * rebuilt text is byte-identical to the original — the oracle
    * recomputes the same comparison, so reconstruction correctness is
    * hash-pinned, not just asserted in a spec.
    *
    * Scale shape: one corpus pass explodes paragraphs; the dedup is ONE
    * hash shuffle on the paragraph content (window groups are
    * duplicate-count sized); reassembly is ONE doc_id shuffle with an
    * order-free sorted-collect; the accounting join is doc_id-keyed.
    * Nothing is all-pairs, nothing is driver-side.
    */
  /** Per-source accounting over a per-doc rebuild frame (n_paras,
    * n_removed, chars_removed, rebuilt) — shared by the exact and
    * near-dup paragraph queries; both oracles recompute it identically.
    */
  private def paragraphAccounting(s: SparkSession, dir: String, perDoc: DataFrame): DataFrame =
    Tables.documents(s, dir).select("doc_id", "source", "text")
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_paras"), lit(0L))).as("paras_total"),
        sum(coalesce(col("n_removed"), lit(0L))).as("paras_removed"),
        sum(when(coalesce(col("n_removed"), lit(0L)) > 0, 1L).otherwise(0L))
          .as("docs_touched"),
        sum(when(coalesce(col("n_removed"), lit(0L)) === 0 &&
            coalesce(col("rebuilt"), lit("")) === coalesce(col("text"), lit("")), 1L)
          .otherwise(0L)).as("docs_roundtrip_exact"),
        sum(coalesce(col("chars_removed"), lit(0L))).as("chars_removed"))
      .orderBy("source")

  def paragraphRebuild(s: SparkSession, dir: String): DataFrame =
    paragraphAccounting(s, dir, paragraphRebuildPerDoc(s, dir))

  private val paragraphRebuildSql =
    s"""WITH tk AS (
       |  SELECT doc_id, $dToks AS w FROM documents
       |), paras AS (
       |  SELECT doc_id, g, array_to_string(w[g*8+1 : g*8+8], ' ') AS para
       |  FROM tk, unnest(range(0, CAST(ceil(len(w)/8.0) AS BIGINT))) AS u(g)
       |  WHERE len(w) >= 1
       |), ranked AS (
       |  SELECT doc_id, g, para,
       |    row_number() OVER (PARTITION BY para ORDER BY doc_id, g) AS rn
       |  FROM paras
       |), per_doc AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_paras,
       |    CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    CAST(sum(CASE WHEN rn > 1 THEN length(para) ELSE 0 END) AS BIGINT)
       |      AS chars_removed,
       |    array_to_string(list(para ORDER BY g) FILTER (WHERE rn = 1), ' ')
       |      AS rebuilt
       |  FROM ranked GROUP BY 1)
       |SELECT d.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(coalesce(p.n_paras, 0)) AS BIGINT) AS paras_total,
       |  CAST(sum(coalesce(p.n_removed, 0)) AS BIGINT) AS paras_removed,
       |  CAST(sum(CASE WHEN coalesce(p.n_removed, 0) > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS docs_touched,
       |  CAST(sum(CASE WHEN coalesce(p.n_removed, 0) = 0
       |      AND coalesce(p.rebuilt, '') = coalesce(d.text, '') THEN 1 ELSE 0 END)
       |    AS BIGINT) AS docs_roundtrip_exact,
       |  CAST(sum(coalesce(p.chars_removed, 0)) AS BIGINT) AS chars_removed
       |FROM documents d LEFT JOIN per_doc p USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-doc core of [[paragraphNearDup]] — the NEAR-dup sibling of
    * [[paragraphRebuildPerDoc]]: windows of ≥ 4 words get 4-gram shingles
    * → 16-hash MinHash → 4 band buckets; within each bucket the earliest
    * (doc_id, position) member is the REPRESENTATIVE, and any later
    * member whose exact shingle Jaccard against its representative
    * reaches 0.5 is removed (the star-edge rule [[lshCandidates]] uses —
    * per-bucket work is member-count sized, never all-pairs, so the
    * shape survives duplicate-dense corpora). Windows under 4 words
    * cannot shingle and are exempt (always kept) in BOTH engines.
    */
  private[graft] def paragraphNearDupPerDoc(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val paras = Tables.documents(s, dir)
      .withColumn("tk0", expr(toks))
      .filter(size(col("tk0")) >= 1)
      .withColumn("g",
        explode(sequence(lit(0L), ceil(size(col("tk0")) / lit(8.0)).cast("long") - 1)))
      .select(col("doc_id"), col("g"),
        slice(col("tk0"), (col("g") * 8 + 1).cast("int"), lit(8)).as("wtk"))
      .withColumn("para", array_join(col("wtk"), " "))
    val banded = paras.filter(size(col("wtk")) >= 4)
      .withColumn("shingles", expr("word_shingles(wtk, 4)"))
      .withColumn("sig", expr("minhash_sig(shingles, 16)"))
      .select(col("doc_id"), col("g"), col("shingles"),
        explode(expr(
          """transform(sequence(0, 3),
            |  b -> named_struct('band', b, 'bhash', xxhash64(slice(sig, b * 4 + 1, 4))))""".stripMargin))
          .as("bb"))
      .select(col("doc_id"), col("g"), col("shingles"),
        col("bb.band").as("band"), col("bb.bhash").as("bhash"))
    // both the representative side and the candidate side of the confirm
    // join read this ranked frame; materialized so the shingle + MinHash
    // scalar work and the band-key window run ONCE, not once per side —
    // size-gated (r18): the frame is corpus-sized
    val ranked = Materialize.gated(Tables.documents(s, dir),
      banded.withColumn("rn",
        row_number().over(
          Window.partitionBy("band", "bhash").orderBy(asc("doc_id"), asc("g")))),
      "neardup-ranked")
    val reps = ranked.filter(col("rn") === 1)
      .select(col("band"), col("bhash"), col("shingles").as("rsh"))
    // exact shingle Jaccard vs the bucket representative; the ratio of
    // small-integer counts is IEEE-exact on both engines, so the 0.5
    // threshold is portable without rounding
    val removed = ranked.filter(col("rn") > 1)
      .join(reps, Seq("band", "bhash"))
      .filter(size(array_intersect(col("shingles"), col("rsh"))).cast("double") /
        size(array_union(col("shingles"), col("rsh"))).cast("double") >= 0.5)
      .select("doc_id", "g").distinct()
      .withColumn("removed", lit(true))
    paras.join(removed, Seq("doc_id", "g"), "left")
      .withColumn("rm", coalesce(col("removed"), lit(false)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("rm"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("rm"), length(col("para")).cast("long")).otherwise(0L))
          .as("chars_removed"),
        array_join(transform(
          array_sort(collect_list(when(!col("rm"), struct(col("g"), col("para"))))),
          x => x.getField("para")), " ").as("rebuilt"))
  }

  /** Paragraph-level NEAR-dup dedup WITH document reconstruction — the
    * fuzzy sibling of [[paragraphRebuild]]: production pipelines remove
    * not only byte-identical paragraphs but boilerplate variants (a
    * changed word in an 8-word window still minhash-collides and clears
    * the 0.5-Jaccard bar). Same output schema and accounting as the exact
    * row, same hash-pinned round-trip law; the removal predicate is
    * MinHash-band blocking plus an exact-Jaccard confirm against the
    * bucket representative. Scale shape: one corpus pass explodes
    * windows, signatures are window-local scalar work, bucket ranking is
    * one exchange on the band key with bucket-sized groups, the confirm
    * join is representative-star (linear in members), and reassembly is
    * the rebuild row's doc-keyed sorted-collect.
    */
  def paragraphNearDup(s: SparkSession, dir: String): DataFrame =
    paragraphAccounting(s, dir, paragraphNearDupPerDoc(s, dir))

  private val paragraphNearDupSql =
    s"""WITH tk AS (
       |  SELECT doc_id, $dToks AS w FROM documents
       |), paras AS (
       |  SELECT doc_id, g, w[g*8+1 : g*8+8] AS wtk,
       |    array_to_string(w[g*8+1 : g*8+8], ' ') AS para
       |  FROM tk, unnest(range(0, CAST(ceil(len(w)/8.0) AS BIGINT))) AS u(g)
       |  WHERE len(w) >= 1
       |), shing AS (
       |  SELECT doc_id, g,
       |    list_distinct(list_transform(range(1, len(wtk) - 2),
       |      i -> concat_ws(' ', wtk[i], wtk[i + 1], wtk[i + 2], wtk[i + 3]))) AS shingles
       |  FROM paras WHERE len(wtk) >= 4
       |), msig AS (
       |  SELECT doc_id, g, shingles,
       |    list_transform(range(0, 16), k -> list_min(list_transform(list_zip(
       |      list_transform(shingles, sh -> CAST(('0x' || substr(md5(sh), 1, 13)) AS BIGINT)),
       |      list_transform(shingles, sh -> CAST(('0x' || substr(md5(sh), 14, 13)) AS BIGINT))),
       |      p -> p[1] + k * p[2]))) AS sig
       |  FROM shing
       |), banded AS (
       |  SELECT doc_id, g, shingles, r.range AS band,
       |    md5(concat_ws(',', sig[CAST(r.range * 4 + 1 AS INT)], sig[CAST(r.range * 4 + 2 AS INT)],
       |                       sig[CAST(r.range * 4 + 3 AS INT)], sig[CAST(r.range * 4 + 4 AS INT)])) AS bhash
       |  FROM msig CROSS JOIN range(0, 4) r
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY band, bhash ORDER BY doc_id, g) AS rn
       |  FROM banded
       |), reps AS (
       |  SELECT band, bhash, shingles AS rsh FROM ranked WHERE rn = 1
       |), removed AS (
       |  SELECT DISTINCT m.doc_id, m.g
       |  FROM ranked m JOIN reps USING (band, bhash)
       |  WHERE m.rn > 1
       |    AND CAST(len(list_intersect(m.shingles, rsh)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(m.shingles, rsh))) AS DOUBLE) >= 0.5
       |), per_doc AS (
       |  SELECT p.doc_id,
       |    CAST(count(*) AS BIGINT) AS n_paras,
       |    CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN length(p.para) ELSE 0 END) AS BIGINT)
       |      AS chars_removed,
       |    array_to_string(list(p.para ORDER BY p.g) FILTER (WHERE r.doc_id IS NULL), ' ')
       |      AS rebuilt
       |  FROM paras p LEFT JOIN removed r ON p.doc_id = r.doc_id AND p.g = r.g
       |  GROUP BY 1)
       |SELECT d.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(coalesce(p.n_paras, 0)) AS BIGINT) AS paras_total,
       |  CAST(sum(coalesce(p.n_removed, 0)) AS BIGINT) AS paras_removed,
       |  CAST(sum(CASE WHEN coalesce(p.n_removed, 0) > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS docs_touched,
       |  CAST(sum(CASE WHEN coalesce(p.n_removed, 0) = 0
       |      AND coalesce(p.rebuilt, '') = coalesce(d.text, '') THEN 1 ELSE 0 END)
       |    AS BIGINT) AS docs_roundtrip_exact,
       |  CAST(sum(coalesce(p.chars_removed, 0)) AS BIGINT) AS chars_removed
       |FROM documents d LEFT JOIN per_doc p USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_paragraph_neardup", paragraphNearDup, Some(paragraphNearDupSql)),
    QueryDef("dedup_paragraph_rebuild", paragraphRebuild, Some(paragraphRebuildSql)),
    QueryDef("dedup_contrastive_pairs", contrastivePairs, Some(contrastivePairsSql)),
    QueryDef("dedup_impact_report", dedupImpact, Some(dedupImpactSql)),
    QueryDef("dedup_template_boundaries", templateBoundaries,
      Some(templateBoundariesSql)),
    QueryDef("dedup_lsh_recall_eval", lshRecallEval, Some(lshRecallEvalSql)),
    QueryDef("curation_lsh_band_tuning", lshBandTuning, Some(lshBandTuningSql)),
    QueryDef("dedup_cdc_chunks", cdcChunks, Some(cdcChunksSql)),
    QueryDef("dedup_incremental", incrementalDedup, Some(incrementalDedupSql)),
    QueryDef("dedup_index_maintenance", indexMaintenance, Some(indexMaintenanceSql)),
    QueryDef("dedup_index_census", indexMaintenanceCensus, Some(indexMaintenanceCensusSql)),
    // oracle deliberately shared with dedup_clusters: hash equality proves
    // the incremental closure ≡ the from-scratch recompute
    QueryDef("dedup_clusters_incremental",
      (s, dir) => incrementalClusters(s, dir), Some(dedupClustersSql)),
    QueryDef("dedup_exact", exactDedup, Some(exactDedupSql)),
    QueryDef("dedup_substring_spans", substringSpans, Some(substringSpansSql)),
    QueryDef("dedup_semantic", semanticDedup, Some(semanticDedupSql)),
    QueryDef("dedup_sorted_neighborhood", sortedNeighborhood, Some(sortedNeighborhoodSql)),
    QueryDef("dedup_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    QueryDef("dedup_prefix_filter", prefixFilter, Some(prefixFilterSql)),
    QueryDef("dedup_containment", containmentPairs, Some(containmentPairsSql)),
    QueryDef("dedup_simhash_pairs", simhashPairs, Some(simhashPairsSql)),
    QueryDef("dedup_simhash", simhash, Some(simhashSql)),
    QueryDef("dedup_minhash_lsh", minhashLsh, Some(minhashLshSql)),
    QueryDef("dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    QueryDef("dedup_embedding_cosine", embeddingNearDup, Some(embeddingNearDupSql))
  )
}
