package graft.graph

import graft.Tables
import graft.cluster.KMeans
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the reference's actual property graph — Image nodes, Centroid
  * nodes, CLOSEST_TO edges weighted by cosine similarity
  * (/root/reference/kmeans_clustering/image_classification.py:217-221,
  * :233-240, :438-445) — from the embeddings table and one k-means
  * assignment pass. Centroid ids are offset into their own id range so
  * both node families share one key space. */
object ClusterGraph {

  val CentroidIdOffset = 10000000L

  def build(s: SparkSession, d: String, k: Int): PropertyGraph = {
    val e = Tables.embeddings(s, d)
    val cents = KMeans.initCentroids(e, k)
    val assigned = KMeans.assign(e, cents)
    val imageNodes = e.select(
      col("vec_id").as("id"), lit("Image").as("label"),
      concat(lit("vec_"), col("vec_id")).as("name"))
    val centroidNodes = cents.select(
      (col("cid") + CentroidIdOffset).as("id"), lit("Centroid").as("label"),
      concat(lit("centroid_"), col("cid")).as("name"))
    val edges = assigned.select(
      col("vec_id").as("src"), (col("cid") + CentroidIdOffset).as("dst"),
      lit("CLOSEST_TO").as("rel_type"), col("sim").as("weight"))
    PropertyGraph(imageNodes.unionByName(centroidNodes), edges)
  }
}
