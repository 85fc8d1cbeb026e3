package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** The TOKEN-POSITION table `tokens(doc_id, i, word)` persisted
  * content-keyed (same invalidation contract as the shingle table,
  * [[Dedup.shingleTable]]) — the tokenized view of the corpus that the
  * positional operators (x36 vocab-id packing, x69 entropy, x71
  * frequency subsampling, x72 burstiness) all consume.
  *
  * Before this table each consumer re-ran `split` + `posexplode` over
  * `documents` per query. At 100 TB the tokenized corpus is THE ingest
  * artifact a training pipeline writes exactly once — it is the format
  * downstream jobs read — so recomputing it per query was both slow and
  * architecturally wrong; warm reads now scan a columnar (doc_id, i,
  * word) parquet and prune to the columns each query needs.
  *
  * Positions are raw `split(text, ' ')` semantics: empty tokens are KEPT
  * so positional consumers (x36's checksum, x71's (doc_id, i) hash) see
  * the exact oracle stream; consumers that want non-empty words filter on
  * their side, as their oracle SQL does.
  */
object Tokens {

  private[operators] def table(s: SparkSession, d: String): DataFrame =
    DerivedTable(s, d, "documents", "tokens") {
      Tables.documents(s, d).select(col("doc_id"),
        posexplode(Text.tokens(col("text"))).as(Seq("i", "word")))
    }
}
