package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.io.{JsonDocumentSink, RestSource, StageStore}

class IoSpec extends SparkTestBase {
  import spark.implicits._

  test("Op-5 stage store: versions, retention, latest pointer") {
    val root = Files.createTempDirectory("graft-store").toString
    val store = new StageStore(spark, root, retain = 2)
    store.write(Seq(1L).toDF("v"), 100L)
    store.write(Seq(2L).toDF("v"), 200L)
    store.write(Seq(3L).toDF("v"), 300L)
    assert(store.versions() == Seq(300L, 200L))          // pruned to 2
    assert(store.readLatest().as[Long].head() == 3L)     // latest pointer
    assert(store.read(200L).as[Long].head() == 2L)
  }

  test("Op-6 JSON document sink: records orient + filename contract") {
    val root = Files.createTempDirectory("graft-json").toString
    val df = Seq((1L, "a"), (2L, null: String)).toDF("id", "title")
    val name = JsonDocumentSink.documentName("v1", "coct-service_alerts",
      "7days", planned = false)
    assert(name == "v1/coct-service_alerts-7days-unplanned.json")
    val path = JsonDocumentSink.write(df.orderBy("id"), root, name)
    val body = new String(Files.readAllBytes(Paths.get(path)))
    assert(body.startsWith("[") && body.endsWith("]"))
    assert(body.contains("\"id\":1") && body.contains("\"title\":\"a\""))
    assert(!body.contains("\"title\":null"))  // null fields pruned (toJSON drops)
  }

  test("Op-1/2 REST source: pagination + record flattening") {
    val pages = Map(
      None -> (Seq(
        Map[String, Any]("Id" -> 1L, "Title" -> "t1", "__metadata" -> Map("x" -> 1),
          "Nested" -> Map("a" -> "b"), "NullCol" -> null),
        Map[String, Any]("Id" -> 2L, "Title" -> "t2")), Some("p2")),
      Some("p2") -> (Seq(Map[String, Any]("Id" -> 3L)), None))
    val fetcher = new RestSource.PageFetcher {
      def fetch(token: Option[String]) = pages(token)
    }
    val schema = StructType(Seq(StructField("Id", LongType),
      StructField("Title", StringType)))
    val got = RestSource.load(spark, fetcher, schema)
      .as[(Option[Long], Option[String])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((Some(1L), Some("t1")), (Some(2L), Some("t2")),
      (Some(3L), None)))
  }
}
