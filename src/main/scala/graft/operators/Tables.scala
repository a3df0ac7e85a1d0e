package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table readers for the driver testdata. Every query reads through these so
  * filters/projections push into the parquet scan (verify with
  * .explain: PushedFilters / ReadSchema).
  */
object Tables {
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
  def events(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/events.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/customer.parquet")
  def nation(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/region.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame       = s.read.parquet(s"$dir/part.parquet")
}
