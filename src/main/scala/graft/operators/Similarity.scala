package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, 64-dim):
  *
  *   - brute-force cosine top-k (the exactness baseline; fine whenever the
  *     query set is small — it broadcasts the queries and scans the corpus
  *     once, embarrassingly parallel);
  *   - random-hyperplane LSH bucketing (the scale path: each vector hashes
  *     to a bucket, candidate generation is a bucket equijoin instead of a
  *     cross product);
  *   - cosine near-duplicate pairs over a bounded subset.
  *
  * Dot products run in whole-stage-codegen'd higher-order functions
  * (`zip_with` + `aggregate`) over doubles — no UDFs, no Python. Output
  * similarities are rounded to 4 decimals so Spark's ordered array fold
  * and DuckDB's unordered join-sum hash-match despite ulp-level drift.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** embedding (array<float>) → array<double> plus its L2 norm. */
  private def withVec(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, 0D, (a, x) -> a + x * x)")))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  /** Exact cosine top-k of `corpus` for each row of `queries` (both shaped
    * like `embeddings`). Queries are broadcast; one corpus scan. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withVec(queries).select(col("vec_id").as("query_id"),
      col("v").as("qv"), col("norm").as("qnorm"))
    val c = withVec(corpus)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("sim"), 4).as("sim_r"))
      .orderBy("query_id", "rnk")
  }

  /** Random-hyperplane LSH: `planes` sign bits → one bucket id per vector;
    * neighbors are searched only within the query's bucket. Hyperplane
    * matrix is generated from a fixed seed (deterministic across runs). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 10, dim: Int = 64): DataFrame = {
    val rnd = new scala.util.Random(7)
    val mat: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
    val pl = typedLit(mat)
    def bucket(v: Column): Column =
      aggregate(
        transform(pl, p => when(dot(p, v) > 0, 1).otherwise(0)),
        lit(0), (acc, bit) => acc * 2 + bit)
    val q = withVec(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), bucket(col("v")).as("bucket"))
    val c = withVec(corpus).withColumn("bucket", bucket(col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    c.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), round(col("sim"), 4).as("sim_r"))
      .orderBy("query_id", "rnk")
  }

  /** IVF-style ANN: a fixed coarse quantizer (seeded pseudorandom
    * centroids standing in for trained k-means — same plan shape), each
    * vector assigned to its nearest centroid (argmax dot on the literal
    * centroid matrix), queries probing their `nprobe` nearest centroid
    * cells. Candidate generation is a cell equijoin — the plan a trained
    * IVF index would produce, with centroid training swappable later. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Int = 16, nprobe: Int = 2, dim: Int = 64): DataFrame = {
    val rnd = new scala.util.Random(13)
    val cents: Seq[Seq[Double]] =
      Seq.fill(centroids)(Seq.fill(dim)(rnd.nextGaussian()))
    val cm = typedLit(cents)
    def cellDots(v: Column): Column = transform(cm, c => dot(c, v))
    // corpus side: single best cell per vector
    def bestCell(v: Column): Column = {
      val dots = cellDots(v)
      (array_position(dots, array_max(dots)) - 1).cast("int")
    }
    val c = withVec(corpus).withColumn("cell", bestCell(col("v")))
    // query side: nprobe best cells via posexplode + rank
    val q0 = withVec(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
      .select(col("query_id"), col("qv"), col("qnorm"),
        posexplode(cellDots(col("qv"))).as(Seq("cell", "cdot")))
    val wq = Window.partitionBy("query_id").orderBy(col("cdot").desc)
    val q = q0.withColumn("cr", row_number().over(wq))
      .where(col("cr") <= nprobe)
      .select("query_id", "qv", "qnorm", "cell")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    c.join(broadcast(q), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), round(col("sim"), 4).as("sim_r"))
      .orderBy("query_id", "rnk")
  }

  /** Shared oracle scaffolding: per-(vec,index) unnest with exact double
    * math, mirroring the Spark `zip_with`/`aggregate` fold. */
  private def sqlUnnest(filter: String): String =
    s"""u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |        generate_subscripts(embedding, 1) AS i
       |      FROM embeddings$filter),
       |n AS (SELECT vec_id, SUM(x*x) AS nsq FROM u GROUP BY vec_id)""".stripMargin

  val queries: Seq[Q] = Seq(

    Q("ann_cosine_topk", Some(
      s"""WITH ${sqlUnnest("")},
         |q AS (SELECT * FROM u WHERE vec_id % 50 = 0),
         |d AS (SELECT q.vec_id AS qid, u.vec_id AS nid, SUM(q.x * u.x) AS dot
         |      FROM q JOIN u ON q.i = u.i AND q.vec_id <> u.vec_id
         |      GROUP BY qid, nid),
         |s AS (SELECT qid, nid, dot / (sqrt(nq.nsq) * sqrt(nn.nsq)) AS sim
         |      FROM d JOIN n nq ON nq.vec_id = qid JOIN n nn ON nn.vec_id = nid),
         |r AS (SELECT qid AS query_id, nid AS neighbor_id,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |          ORDER BY sim DESC, nid) AS INTEGER) AS rnk,
         |        ROUND(sim, 4) AS sim_r
         |      FROM s)
         |SELECT query_id, neighbor_id, rnk, sim_r FROM r
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)) { (s, dir) =>
      val e = emb(s, dir)
      bruteForceTopK(e.where(col("vec_id") % 50 === 0), e, 5)
    },

    Q("ann_lsh_topk", None) { (s, dir) =>
      val e = emb(s, dir)
      lshTopK(e.where(col("vec_id") % 50 === 0), e, 5)
    },

    Q("ann_ivf_topk", None) { (s, dir) =>
      val e = emb(s, dir)
      ivfTopK(e.where(col("vec_id") % 50 === 0), e, 5)
    },

    // Cosine near-duplicate pairs over a deterministic subset; with
    // seed-42 gaussian vectors the similarities top out ≈0.32, so 0.25
    // marks the "suspiciously close" tail.
    Q("dedup_embedding_cosine", Some(
      s"""WITH ${sqlUnnest(" WHERE vec_id % 20 = 0")},
         |d AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.x * b.x) AS dot
         |      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
         |      GROUP BY vec_a, vec_b),
         |s AS (SELECT vec_a, vec_b, dot / (sqrt(na.nsq) * sqrt(nb.nsq)) AS sim
         |      FROM d JOIN n na ON na.vec_id = vec_a
         |             JOIN n nb ON nb.vec_id = vec_b)
         |SELECT vec_a, vec_b, ROUND(sim, 4) AS sim_r FROM s
         |WHERE sim >= 0.25 ORDER BY vec_a, vec_b""".stripMargin)) { (s, dir) =>
      val sub = withVec(emb(s, dir).where(col("vec_id") % 20 === 0))
      val a = sub.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("norm").as("na"))
      val b = sub.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("norm").as("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .where(col("sim") >= 0.25)
        .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim_r"))
        .orderBy("vec_a", "vec_b")
    })
}
