package org.apache.spark.sql.graftx

import org.apache.spark.SparkContext

/** Bridge to the live `SparkContext.conf` (a `private[spark]` member — this
  * package sits inside org.apache.spark, the same Column↔Expression bridge
  * discipline as the rest of graftx). `SparkContext.getConf` returns a CLONE,
  * which cannot register anything for future sessions.
  *
  * Why the engine needs it: a JDBC connection through the Thrift endpoint
  * gets a FRESH `newSession()`, whose SQLConf initializes from the context
  * conf — so a catalog registered only on the serving session
  * (`spark.conf.set("spark.sql.catalog.…")`) would be invisible to every
  * client. Writing the registration here makes `graft.<table>` resolve in
  * all sessions, current and future.
  */
object ContextConf {
  def set(sc: SparkContext, key: String, value: String): Unit = {
    sc.conf.set(key, value)
    ()
  }
}
