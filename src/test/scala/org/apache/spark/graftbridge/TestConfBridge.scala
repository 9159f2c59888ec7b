package org.apache.spark.graftbridge

import org.apache.spark.{SparkConf, SparkContext}

/** Test-only access to the LIVE SparkConf of a running context
  * (`sc.conf` is private[spark]; `sc.getConf` returns a copy).
  * `SparkSession.Builder.getOrCreate` reads `spark.sql.extensions` from this
  * object — the spec for the extensions wiring needs to plant the conf where
  * spark-submit would put it, without restarting the suite-shared context.
  */
object TestConfBridge {
  def liveConf(sc: SparkContext): SparkConf = sc.conf
}
