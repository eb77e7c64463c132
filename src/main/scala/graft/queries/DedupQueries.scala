package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators over `documents` (training-data pipeline):
  * exact (content-hash), with MinHash-LSH / SimHash / n-gram-Jaccard /
  * embedding-cosine variants in graft.operators.Dedup.
  */
object DedupQueries {

  def all: Seq[GraftQuery] = Seq(
    // exact dedup: md5 content grouping, keep = lowest doc_id per group.
    // At scale this is one shuffle on the 16-byte digest, never on the text.
    GraftQuery(
      "dedup_exact",
      (s, dir) => {
        val w = Window.partitionBy(md5(col("text").cast("binary")))
        Tables
          .documents(s, dir)
          .select(
            col("doc_id"),
            when(col("doc_id") === min(col("doc_id")).over(w), 1).otherwise(0).as("keep"),
            count(lit(1)).over(w).cast("int").as("n_copies"))
      },
      Some("""SELECT doc_id,
CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS keep,
CAST(count(*) OVER (PARTITION BY md5(text)) AS INT) AS n_copies
FROM documents"""))
  )
}
