package graft.cluster

import graft.{Q, Tables}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib classification over the embedding features — the supervised
  * counterpart the reference README advertises ("image classification",
  * /root/reference/README.md:1) but never implements beyond unsupervised
  * k-means. Deterministic split by key hash; multinomial logistic
  * regression on the 64-dim vectors.
  *
  * Scale: VectorUDT rows feed MLlib's own distributed LBFGS — gradient
  * aggregation is a treeAggregate (map-side partials), the standard
  * 100 TB training shape. Float reductions vary by partition order →
  * rows-only driver check; invariants asserted in ClassifySpec.
  */
object Classify {

  import Tables._

  def featurize(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("features"),
      col("label").cast("double").as("label"))

  /** Deterministic 80/20 split on the id hash, train LR, score held-out. */
  def trainEval(s: SparkSession, d: String): DataFrame = {
    val data = featurize(s, d)
    val train = data.filter(detHash(col("vec_id")) % 5 =!= 0)
    val test = data.filter(detHash(col("vec_id")) % 5 === 0)
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setFamily("multinomial")
    val model = lr.fit(train)
    val pred = model.transform(test)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(pred)
    pred.groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("prediction") === col("label"), 1).otherwise(0)).as("correct"))
      .withColumn("overall_accuracy", lit(acc))
      .orderBy("label")
  }

  val queries: Seq[Q] = Seq(
    // MLlib training is iterative + float-order-dependent → rows-only.
    Q("ml_classify_eval", (s, d) => trainEval(s, d), None),

    // ── distributed OLS (simple linear regression by sufficient stats) ─
    // Closed-form least squares of price-on-quantity per return flag —
    // the moments-based shape that scales: ONE partial-agg'd pass
    // accumulates the five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    // Σy²); slope/intercept/R² are O(1) arithmetic on the tiny result.
    // At 100 TB this is a single map-side-combined shuffle of 3 group
    // rows — the same pattern MLlib's treeAggregate runs internally,
    // expressed relationally so Catalyst codegens it. EXACTNESS: x is
    // integral quantity, y is floor(price) whole dollars, so every
    // moment is an order-free BIGINT sum (max ~3.3e15 ≪ 2^63); the
    // final formulas are one shared double expression tree over exact
    // integers → bit-identical on both engines (the evt_ema
    // convention). Denominator n·Σx²−(Σx)² > 0 whenever a group has
    // two distinct x — true by construction here.
    Q(
      "ml_linreg",
      (s, d) => {
        val m = lineitem(s, d)
          .select(col("l_returnflag").as("rf"),
            col("l_quantity").cast("long").as("x"),
            floor(col("l_extendedprice")).cast("long").as("y"))
          .groupBy("rf")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val nD = col("n").cast("double")
        def dd(c: String) = col(c).cast("double")
        val covn = nD * dd("sxy") - dd("sx") * dd("sy")
        val varxn = nD * dd("sxx") - dd("sx") * dd("sx")
        val varyn = nD * dd("syy") - dd("sy") * dd("sy")
        val slope = covn / varxn
        m.select(col("rf"), col("n"), slope.as("slope"),
            ((dd("sy") - slope * dd("sx")) / nD).as("intercept"),
            (covn * covn / (varxn * varyn)).as("r2"))
          .orderBy("rf")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             |    sum(x * x) AS sxx, sum(y * y) AS syy
             |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
             |          CAST(floor(l_extendedprice) AS BIGINT) AS y FROM lineitem)
             |  GROUP BY 1)
             |SELECT rf, n,
             |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
             |  (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE) AS intercept,
             |  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
             |FROM m ORDER BY rf""".stripMargin)
    ),

    // ── multinomial naive Bayes: train + score, hash-exact ─────────────
    // The classic text classifier (language ID here: predict
    // documents.lang from tokens), expressed so the WHOLE pipeline —
    // train counts, Laplace smoothing, log-space scoring, argmin — is
    // driver-hashable, which float log-likelihoods never are. Per-term
    // weights −ln((c(w,c)+1)/(tokens_c+V)) and per-class priors
    // −ln(docs_c/docs) are floor-quantized to the 2^-20 dyadic grid
    // (the surprisal convention: ClassifySpec sweeps every observed
    // ratio's distance to a floor boundary, so cross-engine ln ulps
    // cannot flip a cell), making each document's NLL an order-free
    // exact sum; the argmin ties to the smallest class name. Train/test
    // split is the deterministic id-hash 80/20 every eval here uses.
    // SCALE: counts are two partial-agg shuffles; scoring is one
    // equi-join of test tf rows against the (term × 5 classes) weight
    // table — the weight side shuffles once at vocab size, never
    // broadcast-assumed; the 5-row class/prior tables ARE broadcast.
    Q(
      "ml_naive_bayes",
      (s, d) => {
        import graft.ops.Text.tokens
        val docs = documents(s, d)
        val train = docs.filter(detHash(col("doc_id")) % 5 =!= 0)
        val test = docs.filter(detHash(col("doc_id")) % 5 === 0)
        val trainToks = train
          .select(col("lang"), explode(tokens(col("text"))).as("term"))
          .localCheckpoint(false) // class counts + totals + V read one tokenization
        val cwc = trainToks.groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
        val ctot = trainToks.groupBy("lang").agg(count(lit(1)).as("tot"))
        val vsize = trainToks.agg(countDistinct(col("term")).as("v"))
        val ndocs = train.groupBy("lang").agg(count(lit(1)).as("nd"))
          .crossJoin(broadcast(train.agg(count(lit(1)).as("ndall"))))
        val grid = lit(1048576.0)
        val prior = ndocs.select(col("lang"),
          (floor(-log(col("nd").cast("double") / col("ndall").cast("double"))
            * grid) / grid).as("psq"))
        val tf = test
          .select(col("doc_id"), col("lang").as("true_lang"),
            explode(tokens(col("text"))).as("term"))
          .groupBy("doc_id", "true_lang", "term").agg(count(lit(1)).as("tf"))
        val scored = tf
          .crossJoin(broadcast(ctot.crossJoin(vsize)))
          .join(cwc, Seq("lang", "term"), "left")
          .select(col("doc_id"), col("true_lang"), col("lang"), col("tf"),
            (floor(-log((coalesce(col("cnt"), lit(0L)) + 1L).cast("double") /
              (col("tot") + col("v")).cast("double")) * grid) / grid).as("sq"))
          .groupBy("doc_id", "true_lang", "lang")
          .agg(sum(col("tf").cast("double") * col("sq")).as("llsum"))
          .join(broadcast(prior), "lang")
          .select(col("doc_id"), col("true_lang"), col("lang"),
            (col("psq") + col("llsum")).as("nll"))
        scored.withColumn("rk", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("nll").asc, col("lang").asc)))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("true_lang"), col("lang").as("pred"),
            col("nll"))
          .orderBy("doc_id")
      },
      Some(s"""WITH train AS (
              |  SELECT * FROM documents WHERE ${detHashSql("doc_id")} % 5 <> 0),
              |test AS (
              |  SELECT * FROM documents WHERE ${detHashSql("doc_id")} % 5 = 0),
              |ttoks AS (
              |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM train),
              |cwc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
              |        FROM ttoks GROUP BY 1, 2),
              |ctot AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot
              |         FROM ttoks GROUP BY 1),
              |vsize AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM ttoks),
              |prior AS (
              |  SELECT lang, floor(-ln(CAST(count(*) AS DOUBLE) /
              |    (SELECT CAST(count(*) AS DOUBLE) FROM train)) * 1048576) / 1048576 AS psq
              |  FROM train GROUP BY lang),
              |tf AS (
              |  SELECT doc_id, true_lang, term, CAST(count(*) AS BIGINT) AS tf
              |  FROM (SELECT doc_id, lang AS true_lang,
              |          unnest(string_split(text, ' ')) AS term FROM test)
              |  GROUP BY 1, 2, 3),
              |scored AS (
              |  SELECT tf.doc_id, tf.true_lang, ct.lang,
              |    sum(CAST(tf.tf AS DOUBLE) *
              |      (floor(-ln(CAST(coalesce(cwc.cnt, 0) + 1 AS DOUBLE) /
              |        CAST(ct.tot + vsize.v AS DOUBLE)) * 1048576) / 1048576)) AS llsum
              |  FROM tf
              |  CROSS JOIN ctot ct CROSS JOIN vsize
              |  LEFT JOIN cwc ON cwc.lang = ct.lang AND cwc.term = tf.term
              |  GROUP BY 1, 2, 3),
              |nlls AS (
              |  SELECT s.doc_id, s.true_lang, s.lang, p.psq + s.llsum AS nll,
              |    row_number() OVER (PARTITION BY s.doc_id
              |                       ORDER BY p.psq + s.llsum ASC, s.lang ASC) AS rk
              |  FROM scored s JOIN prior p ON p.lang = s.lang)
              |SELECT doc_id, true_lang, lang AS pred, nll
              |FROM nlls WHERE rk = 1
              |ORDER BY doc_id""".stripMargin)
    )
  )
}
