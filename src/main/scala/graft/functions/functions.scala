package graft

import org.apache.spark.sql.Column

/** graft's scalar function surface — native Catalyst expressions exposed as
  * Column functions (SURVEY.md §4: the deliberate drop-to-custom-Expression
  * points; everything else is Spark built-ins).
  */
package object functions {
  /** codegen cosine similarity over two array<float> columns */
  def cosine_similarity(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.CosineSimilarity(a, b)
}
