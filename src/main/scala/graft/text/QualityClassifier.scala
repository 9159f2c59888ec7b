package graft.text

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the GPT-3 / LLaMA data-curation
  * classifier: a linear model over hashed text features scores every
  * document's probability of being "in-domain" (trained positive = a
  * trusted reference slice, negative = the raw crawl), and downstream
  * sampling keeps the high-probability head. This is the learned
  * counterpart of the rule-based [[CorpusClean.filterCorpus]] and the
  * count-based [[LmScore]]; the reference implements none of the three.
  *
  * fastText-shaped features: word unigrams + bigrams (the corpus-wide
  * lower/whitespace tokenization), hashed into a fixed `dim` by Spark ML's
  * HashingTF (murmur3 — deterministic, vocabulary-free, so the feature
  * space never needs a driver-side dictionary). Training is Spark ML
  * logistic regression: distributed L-BFGS whose per-iteration cost is one
  * map-side gradient treeAggregate — the corpus is never shuffled. Scoring
  * is a narrow map (broadcast coefficient vector, one sparse dot per doc).
  *
  * Not SQL-reproducible by nature (iterative float optimization), so the
  * battery entry is rows-only and carries a measured holdout-accuracy
  * audit column, the same honesty convention as the LSH/ANN families.
  */
object QualityClassifier {

  final case class QcModel(lr: LogisticRegressionModel, dim: Int) {
    /** Persist as a Spark ML model dir + a JSON sidecar with the feature
      * dim (same sidecar convention as [[LmScore.LmModel]]).
      */
    def save(dir: String): Unit = {
      lr.write.overwrite().save(s"$dir/lr")
      graft.util.Sidecar.write(SparkSession.active, dir, "qc-meta.json",
        s"""{"dim":$dim}""")
    }
  }

  object QcModel {
    def load(spark: SparkSession, dir: String): QcModel = {
      val meta = graft.util.Sidecar.read(spark, dir, "qc-meta.json")
      QcModel(LogisticRegressionModel.load(s"$dir/lr"),
        graft.util.Sidecar.requiredLong(meta, "dim", s"$dir/qc-meta.json").toInt)
    }
  }

  /** uni+bigram hashed features; null text featurizes as the empty doc. */
  private def featurize(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    val lowered = lower(col(textCol))
    val grams = concat(TextFunctions.tokens(lowered),
      TextFunctions.shingles(lowered, 2))
    val withArr = df.withColumn("__qc_grams",
      coalesce(grams, array().cast("array<string>")))
    new HashingTF().setInputCol("__qc_grams").setOutputCol("features")
      .setNumFeatures(dim)
      .transform(withArr).drop("__qc_grams")
  }

  /** Exploded sparse hashed features, `(idCol, idx, tf)` — the persistable
    * relational form of [[featurize]]: one row per (doc, nonzero feature
    * index) with its gram count. Exists for the battery's fixture-split
    * scoring oracle (the hashing itself — murmur3 uni+bigram indexing — is
    * the un-oracleable leg; the linear score + threshold over the persisted
    * features and weights is pure SQL) and for exporting features to an
    * external scorer. Docs with no grams (null/empty text) produce no rows.
    */
  def hashedFeatures(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     dim: Int = 1 << 18): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    featurize(docs.select(col(idCol), col(textCol)), textCol, dim)
      .select(col(idCol),
        posexplode(vector_to_array(col("features"))).as(Seq("idx", "tf")))
      .where(col("tf") =!= 0.0d)
      .select(col(idCol), col("idx").cast("long").as("idx"),
        col("tf").cast("long").as("tf"))
  }

  /** Train on `labelCol` (0/1; 1 = in-domain). `dim` trades hash collisions
    * against coefficient-vector size (2^18 is the fastText default scale;
    * the coefficient vector is what scoring broadcasts).
    */
  def train(docs: DataFrame, labelCol: String, textCol: String = "text",
            dim: Int = 1 << 18, regParam: Double = 1e-4,
            maxIter: Int = 50): QcModel = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two: $dim")
    val feats = featurize(
      docs.select(col(labelCol).cast("double").as("label"), col(textCol)),
      textCol, dim)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    val fitted = lr.fit(feats)
    // Spark 4.1's LogisticRegressionModel keeps its trainingSummary in a
    // NON-transient field, and transform()'s udfs capture the model — so a
    // freshly fitted model drags summary -> SparkSession into every task
    // closure (NotSerializableException: ObservationManager). A save/load
    // round-trip is the supported way to get a summary-free model; the
    // coefficient payload is KB-to-MB sized. The scratch path is resolved
    // against the Hadoop DEFAULT filesystem (never java.nio local temp):
    // the ML writer runs on executors, so on a real cluster a driver-local
    // path would be written remotely and read locally — and cleanup goes
    // through the same FS, so nothing leaks on HDFS/object stores.
    val spark = docs.sparkSession
    val tmp = new org.apache.hadoop.fs.Path(
      "/tmp", s"graft-qc-fit-${java.util.UUID.randomUUID}")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val clean = try {
      fitted.write.overwrite().save(tmp.toString)
      LogisticRegressionModel.load(tmp.toString)
    } finally {
      fs.delete(tmp, true)
    }
    QcModel(clean, dim)
  }

  /** Score: (idCol, quality_prob, pred) — `quality_prob` = P(label 1). */
  def score(docs: DataFrame, model: QcModel, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.lr.transform(featurize(docs.select(col(idCol), col(textCol)), textCol, model.dim))
      .select(col(idCol),
        round(element_at(vector_to_array(col("probability")), 2), 6)
          .as("quality_prob"),
        col("prediction").cast("long").as("pred"))
  }
}
