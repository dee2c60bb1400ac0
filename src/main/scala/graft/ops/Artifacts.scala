package graft.ops

import graft.Q
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The artifact store's unified catalog — the cross-family
  * DESCRIBE-HISTORY a 100 TB serving stack's operators actually read.
  * `ann_index_versions` / `dedup_pair_versions` scope ONE lifecycle's
  * families; THIS report lists every published version serving the live
  * corpus across ALL EIGHT artifact families (ANN graph base +
  * incremental, LSH cells, IVF cells, dedup pair spine + post-ingest,
  * BPE and unigram tokenizer files), each with its publication key,
  * fingerprint, and serving role. Scoping is by CONTENT, not path: only
  * versions whose meta fingerprint matches one the report recomputes
  * from the live corpus appear (the oracle SQL is static — it cannot
  * embed a dataset path, and does not need to), so other datasets'
  * artifacts under the same tokens drop out on both engines
  * identically. Lives in its own module because it composes tokens from
  * Vector, KMeans, and Text — building it inside any of them would
  * dereference a query list mid-construction (the Recall convention).
  * SCALE: meta is one row per version; the catalog never touches data
  * tables.
  */
object Artifacts {

  private def tmp = System.getProperty("java.io.tmpdir")

  val queries: Seq[Q] = Seq(
    Q(
      "artifact_catalog",
      (s, d) => {
        // prime every family (each is memoized/served, never rebuilt)
        Vector.gsPersistedIndex(s, d); Vector.gsRepairPublished(s, d)
        Vector.gsInsertPublished(s, d); Vector.lshPersistedCells(s, d)
        graft.cluster.KMeans.ivfPersistedIndex(s, d)
        Text.dupPersistedPairs(s, d); Text.dupIngestPublished(s, d)
        Text.bpePersistedTokenizer(s, d); Text.uniPersistedTokenizer(s, d)
        // the live corpus's three content keys: 3 one-row boundaries
        val (fpFull, _) = Vector.corpusFpN(s, d)
        val (fpSurv, _) = Vector.survivorFpN(s, d)
        val fpDocs = Text.docsFingerprint(s, d)
        def metas(token: String, family: String, fps: Seq[Long],
            role: Column) =
          s.read.parquet(s"$tmp/graft_idx_${token}_*/meta")
            .select(lit(family).as("family"), col("ak"), col("fp"))
            .filter(col("fp").isin(fps: _*))
            .withColumn("role", role)
        metas(Vector.gsIdxToken, "ann_graph", Seq(fpFull, fpSurv),
            when(col("fp") === lit(fpFull), lit("serving_base"))
              .otherwise(lit("serving_post_delete")))
          .unionByName(metas(Vector.gsIncToken, "ann_graph_incremental",
            Seq(fpFull), lit("serving_post_insert")))
          .unionByName(metas(Vector.lshToken, "ann_lsh_cells",
            Seq(fpFull), lit("serving_cells")))
          .unionByName(metas(graft.cluster.KMeans.ivfToken, "ann_ivf_cells",
            Seq(fpFull), lit("serving_ivf_cells")))
          .unionByName(metas(Text.dupIdxToken, "dedup_pairs",
            Seq(fpDocs), lit("serving_pairs")))
          .unionByName(metas(Text.dupIncToken, "dedup_post_ingest",
            Seq(fpDocs), lit("serving_post_ingest")))
          .unionByName(metas(Text.bpeToken, "tokenizer_bpe",
            Seq(fpDocs), lit("serving_tokenizer_bpe")))
          .unionByName(metas(Text.uniToken, "tokenizer_unigram",
            Seq(fpDocs), lit("serving_tokenizer_unigram")))
          .orderBy("family", "ak")
      },
      Some {
        def g(token: String) = s"$tmp/graft_idx_${token}_*/meta/*.parquet"
        def arm(token: String, family: String, fpCte: String, role: String) =
          s"""SELECT '$family' AS family, ak, fp, $role AS role
             |FROM read_parquet('${g(token)}')
             |WHERE fp IN (SELECT fp FROM $fpCte)""".stripMargin
        val arms = Seq(
          arm(Vector.gsIdxToken, "ann_graph", "cfpsfp",
            s"""CASE WHEN fp = (SELECT fp FROM cfp)
               |  THEN 'serving_base' ELSE 'serving_post_delete' END""".stripMargin),
          arm(Vector.gsIncToken, "ann_graph_incremental", "cfp",
            "'serving_post_insert'"),
          arm(Vector.lshToken, "ann_lsh_cells", "cfp", "'serving_cells'"),
          arm(graft.cluster.KMeans.ivfToken, "ann_ivf_cells", "cfp",
            "'serving_ivf_cells'"),
          arm(Text.dupIdxToken, "dedup_pairs", "dfp", "'serving_pairs'"),
          arm(Text.dupIncToken, "dedup_post_ingest", "dfp",
            "'serving_post_ingest'"),
          arm(Text.bpeToken, "tokenizer_bpe", "dfp",
            "'serving_tokenizer_bpe'"),
          arm(Text.uniToken, "tokenizer_unigram", "dfp",
            "'serving_tokenizer_unigram'")
        ).mkString("\nUNION ALL\n")
        s"""WITH cfp AS (SELECT ${Vector.sqlCorpusFingerprint} AS fp FROM embeddings),
           |sfp AS (SELECT ${Vector.sqlSurvivorFingerprint} AS fp FROM embeddings),
           |dfp AS (SELECT ${Text.sqlDocsFingerprint} AS fp FROM documents),
           |cfpsfp AS (SELECT fp FROM cfp UNION ALL SELECT fp FROM sfp)
           |SELECT family, ak, fp, role FROM (
           |$arms
           |) ORDER BY family, ak""".stripMargin
      }
    )
  )
}
