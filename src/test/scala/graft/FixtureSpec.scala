package graft

import graft.api.{EmbeddedVector, SchemaSpec, SearchRequest}
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Drives the engine with the REFERENCE'S OWN test fixtures
  * (`/root/reference/tests/insert.json` + `search.json` — the only data
  * fixtures the reference ships, see FIXTURES.md): a user of the reference
  * can feed the same payloads to this engine and get the same lifecycle
  * (dim-256 collection, insert, threshold-filtered COSINE search).
  */
class FixtureSpec extends SparkSpec {

  private def readJson(path: String) =
    spark.read.option("multiLine", "true").json(path)

  test("reference insert.json + search.json drive the full facade lifecycle") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_fix").toString)

    val ins = readJson("/root/reference/tests/insert.json")
    val tenant = ins.select("for_tenant").head().getString(0)
    assert(tenant == "master")
    val rows = ins.select(explode(col("data")).as("r")).select("r.*").collect()
    val model = rows.head.getAs[String]("model")
    val dim   = rows.head.getSeq[Double](rows.head.fieldIndex("vector")).length
    assert(model == "all-MiniLM-L6-v2" && dim == 256)

    cat.generateSchema(SchemaSpec(tenant, model, dimension = dim))
    val batch = rows.zipWithIndex.map { case (r, i) =>
      // fixture rows carry no key/metadata: keys are generated like the
      // reference's lenient model defaults
      EmbeddedVector(s"fixture_$i", r.getAs[String]("chunk"), model,
        Map.empty, r.getSeq[Double](r.fieldIndex("vector")))
    }.toSeq
    assert(cat.insert(tenant, model, batch) == batch.size)

    val srch = readJson("/root/reference/tests/search.json").head()
    val req = SearchRequest(
      tenant = srch.getAs[String]("for_tenant"),
      model = srch.getAs[String]("model"),
      vector = srch.getSeq[Double](srch.fieldIndex("vector")),
      limit = srch.getAs[Long]("limit").toInt,
      offset = srch.getAs[Long]("offset").toInt,
      nprobe = srch.getAs[Long]("nprobe").toInt,
      roundDecimal = srch.getAs[Long]("round_decimal").toInt,
      scoreThreshold = Some(srch.getAs[Double]("score_threshold")),
      metricType = srch.getAs[String]("metric_type"))
    val resp = cat.search(req)
    // the fixture is built so both docs score ~0.87 >= threshold 0.8
    assert(resp.success && resp.data.size == 2)
    assert(resp.tenantCode == tenant)
    assert(resp.data.exists(_.content == "This is a test."))

    // a stricter threshold produces the reference's empty-result envelope
    val resp2 = cat.search(req.copy(scoreThreshold = Some(0.95)))
    assert(!resp2.success && resp2.message.contains("No vectors found"))
  }
}
