package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` entry point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes every
  * native kernel of the engine (`word_grams`, `minhash_sig`,
  * `simhash64`, `fingerprint31`, `dot_q`, …) available as a SQL
  * function in each session of the application — the config-time
  * sibling of `GraftFunctions.install(spark)` for a live session.
  * Function list + contracts: `org.apache.spark.sql.graft
  * .GraftFunctions` (pinned against the DataFrame facade in
  * GraftExtensionsSpec). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graft.GraftFunctions.register(extensions)
}
