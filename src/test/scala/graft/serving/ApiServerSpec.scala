package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Trainer

class ApiServerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val modelDir: String = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_api_").toString
    val data = Trainer.prepare((1 to 200).map { i =>
      (i % 40 + (i % 7) * 0.5, (i % 90) * 10.0, (i % 13) * 2.0,
        (i % 17) * 3.0, s"food_$i")
    }.toDF("Protein-G", "Energy-KCAL", "Total lipid (fat)-G",
      "Carbohydrate, by difference-G", "description"))
    Trainer.trainAll(data, Seq("description"), out)
    out
  }

  private lazy val server = new ApiServer(spark, modelDir).start()
  private lazy val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder()
      .uri(URI.create(s"http://localhost:${server.boundPort}$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build(), HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder()
      .uri(URI.create(s"http://localhost:${server.boundPort}$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  test("health reports all five models loaded in the reference shape") {
    val r = get("/health")
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""overall_status":"healthy""""))
    assert(r.body().contains(""""operational_models":5"""))
    assert(r.body().contains(""""total_expected_models":5"""))
    assert(r.body().contains(""""model_5_classification":"operational""""))
    assert(r.body().contains(""""model_3_recommendation":"operational""""))
  }

  test("predict routes all five model types") {
    val payload =
      """{"Protein-G": 30.0, "Energy-KCAL": 400.0, "Total lipid (fat)-G": 10.0}"""
    val cluster = post("/predict/1", payload)
    assert(cluster.statusCode() == 200)
    assert(cluster.body().contains(""""model_type":"clustering""""))
    val recs = post("/predict/3", payload)
    assert(recs.statusCode() == 200)
    assert(recs.body().contains(""""recommendations":["""))
    val reg = post("/predict/4", payload)
    assert(reg.statusCode() == 200)
    assert(reg.body().contains("predicted_energy_kcal"))
    val cls = post("/predict/5", payload)
    assert(cls.statusCode() == 200)
    assert(cls.body().contains("is_high_protein"))
  }

  test("absent features default to 0.0 and bad ids are rejected") {
    assert(post("/predict/2", "{}").statusCode() == 200)
    assert(post("/predict/9", "{}").statusCode() == 400)
    assert(post("/predict/abc", "{}").statusCode() == 400)
    assert(get("/predict/1").statusCode() == 405)
  }

  test("known-but-unloaded model returns 404 and health reports unhealthy") {
    // empty model dir: ids 1..5 are known but nothing is loaded
    val empty = java.nio.file.Files.createTempDirectory("graft_api_empty_")
    val s = new ApiServer(spark, empty.toString).start()
    try {
      val r = client.send(HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:${s.boundPort}/predict/4"))
        .POST(HttpRequest.BodyPublishers.ofString("{}"))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 404) // api.py:216 — not-loaded is 404
      val h = client.send(HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:${s.boundPort}/health"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(h.statusCode() == 503)
      assert(h.body().contains(""""overall_status":"unhealthy""""))
      assert(h.body().contains(""""model_4_regression":"not_operational""""))
    } finally s.stop()
  }

  test("stats route reports each model's cumulative slice size") {
    val r5 = get("/stats/model5")
    assert(r5.statusCode() == 200)
    assert(r5.body().contains(""""total_records":200"""))
    val r1 = get("/stats/model1")
    assert(r1.statusCode() == 200)
    assert(r1.body().contains(""""total_records":40"""))
    assert(get("/stats/model9").statusCode() == 404)
    assert(get("/stats/nonsense").statusCode() == 404)
  }

  test("find_allergen searches descriptions within the model slice") {
    // descriptions are food_1..food_200 ordered lexicographically;
    // model5 = full data, so 'food_13' matches exactly food_13 + food_130..139
    val r = get("/find_allergen/model5?allergy=FOOD_13")
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""count":11"""))
    assert(r.body().contains(""""allergy":"FOOD_13""""))
    assert(r.body().contains("food_13"))
    // a slice-respecting search: model1 holds the first 40 rows in
    // description order (food_1, food_10, food_100, ...)
    val r1 = get("/find_allergen/model1?allergy=food_199")
    assert(r1.statusCode() == 200)
    assert(r1.body().contains(""""count":0"""))
    assert(get("/find_allergen/model1").statusCode() == 400)
  }

  test("food_details looks up a row by id within the model slice") {
    val r = get("/food_details/model5/0")
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""id":0"""))
    assert(r.body().contains(""""description":"food_"""))
    assert(r.body().contains("Protein-G"))
    // id 150 exists in the data but is outside model1's 40-row slice
    assert(get("/food_details/model1/150").statusCode() == 404)
    assert(get("/food_details/model5/999999").statusCode() == 404)
    assert(get("/food_details/model5/abc").statusCode() == 404)
  }

  test("concurrent requests are served in parallel without errors") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val payload = """{"Protein-G": 30.0, "Energy-KCAL": 400.0}"""
    val futures = (1 to 16).map { i =>
      Future {
        if (i % 2 == 0) get("/health").statusCode()
        else post(s"/predict/${1 + i % 2 * 3}", payload).statusCode()
      }
    }
    val codes = futures.map(Await.result(_, 30.seconds))
    assert(codes.forall(_ == 200), s"unexpected codes: $codes")
  }

  test("flat JSON parser handles the reference payload shapes") {
    val s = new ApiServer(spark, modelDir)
    val m = s.parseFlatJson(
      """{"Protein-G": 20.5, "Vitamin D (D2 + D3)-UG": -1e2, "n": 3}""")
    assert(m == Map("Protein-G" -> 20.5,
      "Vitamin D (D2 + D3)-UG" -> -100.0, "n" -> 3.0))
    s.stop()
  }
}
