package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.util.Try

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession

import graft.ml.{Serve, Trainer}

/** The reference's serving API (api_server/api.py:172-269), minus
  * Flask: `POST /predict/<model_id>` routes by model type over the
  * artifacts a Trainer run produced, `GET /health` reports the
  * tri-state healthy/degraded/unhealthy summary from per-model load
  * flags (api.py:240-269), and the three README data-surface routes
  * (README.md:116-132) — `GET /find_allergen/model<k>?allergy=x`,
  * `GET /food_details/model<k>/<id>`, `GET /stats/model<k>` — serve
  * model k's cumulative data slice from the food_data artifact. Built
  * on the JDK HTTP server — no extra dependencies — with the engine's
  * distributed recommend path instead of the reference's driver-side
  * sklearn KNN.
  *
  * Request payloads are the reference's flat JSON objects
  * (feature name -> number); absent features default to 0.0
  * (api.py:164).
  */
class ApiServer(spark: SparkSession, modelDir: String, port: Int = 0) {

  private val models: Map[Int, PipelineModel] =
    (1 to Trainer.NumModels).flatMap { k =>
      Try(Trainer.loadModel(modelDir, k)).toOption.map(k -> _)
    }.toMap

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // the JDK server's default executor is the caller thread — serialize
  // -free concurrent request handling needs a real pool (the driver-side
  // scoring in Serve.local* is stateless, so handlers are thread-safe).
  // HttpServer.stop() does NOT terminate a caller-supplied executor, so
  // stop() below must shut it down or its non-daemon threads outlive us.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  def boundPort: Int = server.getAddress.getPort

  /** Parse the reference's flat {"name": number, ...} payload. */
  private[serving] def parseFlatJson(body: String): Map[String, Double] = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?([eE][+-]?[0-9]+)?)""".r
    entry.findAllMatchIn(body).map { m =>
      m.group(1).replace("\\\"", "\"") -> m.group(2).toDouble
    }.toMap
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Single-probe requests score driver-locally (Serve.local*) — no
    * Spark job per HTTP request; the reference instead had to disable
    * whole-stage codegen to make per-request Spark plans tolerable
    * (api.py:58). Model 3 stays distributed: it scans the snapshot
    * table, which is a data-plane operation. */
  private def predict(modelId: Int, payload: Map[String, Double]): String =
    modelId match {
      case 1 | 2 =>
        val cluster = Serve.localCluster(models(modelId), payload)
        s"""{"model_id":$modelId,"model_type":"clustering","prediction":$cluster}"""
      case 3 =>
        val recs = Serve.recommend(spark, models(3),
          s"$modelDir/reco_snapshot", payload).collect()
        val items = recs.map { r =>
          s"""{"description":"${jsonEscape(r.getString(0))}","cosine_distance":${"%.4f".format(r.getDouble(1))}}"""
        }.mkString("[", ",", "]")
        s"""{"model_id":3,"model_type":"recommendation","recommendations":$items}"""
      case 4 =>
        val energy = Serve.localEnergy(models(4), payload)
        s"""{"model_id":4,"model_type":"regression","predicted_energy_kcal":$energy}"""
      case 5 =>
        val (label, p) = Serve.localProtein(models(5), payload)
        s"""{"model_id":5,"model_type":"classification","is_high_protein":${label == 1.0},"probability":$p}"""
    }

  server.createContext("/predict/", (ex: HttpExchange) => {
    val id = Try(ex.getRequestURI.getPath.stripPrefix("/predict/").toInt)
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    (ex.getRequestMethod, id.toOption) match {
      case ("POST", Some(k)) if k >= 1 && k <= Trainer.NumModels =>
        if (!models.contains(k))
          // known-but-unloaded is 404, matching api.py:192,203,216,224
          respond(ex, 404, s"""{"error":"model $k not loaded"}""")
        else
          Try(predict(k, parseFlatJson(body))).fold(
            e => respond(ex, 500,
              s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}"""),
            json => respond(ex, 200, json))
      case ("POST", _) =>
        respond(ex, 400,
          s"""{"error":"model_id must be 1..${Trainer.NumModels}"}""")
      case _ =>
        respond(ex, 405, """{"error":"POST only"}""")
    }
  })

  // ------------------------------------------------------------------
  // README data-surface routes (reference README.md:116-132): each
  // serves model k's cumulative training slice (rn < n*k/NumModels)
  // from the food_data artifact trainAll wrote. These are data-plane
  // operations, so they run as (tiny, pruned) Spark jobs — the scan
  // pushes both the slice bound and the route predicate into parquet.
  // ------------------------------------------------------------------

  private val foods: Option[org.apache.spark.sql.DataFrame] =
    Try(spark.read.parquet(s"$modelDir/food_data")).toOption
  private val foodCount: Long = foods.map(_.count()).getOrElse(0L)

  /** Parse the `model<k>` path segment; None for malformed/unknown. */
  private def modelSeg(seg: String): Option[Int] =
    if (seg.startsWith("model"))
      Try(seg.stripPrefix("model").toInt).toOption
        .filter(k => k >= 1 && k <= Trainer.NumModels)
    else None

  private def sliceBound(k: Int): Long = foodCount * k / Trainer.NumModels

  private def withSlice(ex: HttpExchange, seg: String)(
      f: (Int, org.apache.spark.sql.DataFrame) => Unit): Unit =
    (modelSeg(seg), foods) match {
      case (None, _) =>
        respond(ex, 404, """{"error":"unknown model"}""")
      case (_, None) =>
        respond(ex, 404, """{"error":"no food_data artifact loaded"}""")
      case (Some(k), _) if !models.contains(k) =>
        // a slice trainAll skipped (< minRows) has no model_k artifact;
        // describing its data would report on a model that was never
        // trained — 404, matching the reference's per-model load flags
        respond(ex, 404, s"""{"error":"model $k not loaded"}""")
      case (Some(k), Some(df)) =>
        f(k, df.filter(org.apache.spark.sql.functions.col(Trainer.RnCol) <
          sliceBound(k)))
    }

  /** GET /stats/model<k> — record count of the model's data slice
    * (README.md:128-132). */
  server.createContext("/stats/", (ex: HttpExchange) => {
    val seg = ex.getRequestURI.getPath.stripPrefix("/stats/")
    withSlice(ex, seg) { (k, _) =>
      // contiguous index => the slice size is n*k/NumModels by
      // construction; no job needed for a count
      respond(ex, 200,
        s"""{"model":"model$k","total_records":${sliceBound(k)}}""")
    }
  })

  /** GET /find_allergen/model<k>?allergy=<name> — case-insensitive
    * substring search over the slice's descriptions
    * (README.md:116-120). */
  server.createContext("/find_allergen/", (ex: HttpExchange) => {
    import org.apache.spark.sql.functions.{col, lower}
    val seg = ex.getRequestURI.getPath.stripPrefix("/find_allergen/")
    // parse the RAW query: getQuery already percent-decodes, so using it
    // would both double-decode (throwing on literal '%') and let an
    // encoded '&' in the value truncate the term at the split
    val allergy = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").collectFirst {
        case p if p.startsWith("allergy=") =>
          Try(java.net.URLDecoder.decode(
            p.stripPrefix("allergy="), StandardCharsets.UTF_8))
            .getOrElse(p.stripPrefix("allergy="))
      }
    (allergy, seg) match {
      case (None, _) =>
        respond(ex, 400, """{"error":"allergy query parameter required"}""")
      case (Some(a), _) => withSlice(ex, seg) { (k, slice) =>
        val hits = slice
          // Locale.ROOT to match Spark's locale-independent lower():
          // default-locale toLowerCase maps 'I' to dotless-i under a
          // Turkish JVM locale and the match silently fails
          .filter(lower(col(graft.ml.FoodSchema.descriptionCol))
            .contains(a.toLowerCase(java.util.Locale.ROOT)))
          .select(col(Trainer.RnCol), col(graft.ml.FoodSchema.descriptionCol))
          .orderBy(col(Trainer.RnCol))
          .limit(100).collect()
        val items = hits.map { r =>
          s"""{"id":${r.getLong(0)},"description":"${jsonEscape(r.getString(1))}"}"""
        }.mkString("[", ",", "]")
        respond(ex, 200,
          s"""{"model":"model$k","allergy":"${jsonEscape(a)}",""" +
            s""""count":${hits.length},"matches":$items}""")
      }
    }
  })

  /** GET /food_details/model<k>/<id> — point lookup by the stable row
    * id within the model's slice (README.md:122-126). */
  server.createContext("/food_details/", (ex: HttpExchange) => {
    import org.apache.spark.sql.functions.col
    val parts = ex.getRequestURI.getPath
      .stripPrefix("/food_details/").split("/")
    (parts.lift(0), parts.lift(1).flatMap(s => Try(s.toLong).toOption)) match {
      case (Some(seg), Some(id)) => withSlice(ex, seg) { (k, slice) =>
        slice.filter(col(Trainer.RnCol) === id).collect().headOption match {
          case None =>
            respond(ex, 404,
              s"""{"error":"id $id not in model$k's slice"}""")
          case Some(row) =>
            val fields = row.schema.fields.zipWithIndex
              .filter { case (f, _) => f.name != Trainer.RnCol }
              .map { case (f, i) =>
                val v =
                  if (row.isNullAt(i)) "null"
                  else row.get(i) match {
                    case s: String => s""""${jsonEscape(s)}""""
                    // NaN/Infinity are not legal JSON number literals
                    case d: Double if d.isNaN || d.isInfinite => "null"
                    case f: Float if f.isNaN || f.isInfinite => "null"
                    case x => x.toString
                  }
                s""""${jsonEscape(f.name)}":$v"""
              }.mkString("{", ",", "}")
            respond(ex, 200,
              s"""{"model":"model$k","id":$id,"details":$fields}""")
        }
      }
      case _ =>
        respond(ex, 404, """{"error":"/food_details/model<k>/<id>"}""")
    }
  })

  server.createContext("/health", (ex: HttpExchange) => {
    // tri-state summary from per-model availability, in the reference's
    // exact response shape (api.py:241-269): overall_status +
    // operational_models + total_expected_models + per-model
    // "model_<id>_<type>": "operational"|"not_operational" details
    val loaded = (1 to Trainer.NumModels).filter(models.contains)
    val status =
      if (loaded.size == Trainer.NumModels) "healthy"
      else if (loaded.nonEmpty) "degraded"
      else "unhealthy"
    val details = (1 to Trainer.NumModels).map { k =>
      val op = if (models.contains(k)) "operational" else "not_operational"
      s""""model_${k}_${Trainer.modelType(k)}":"$op""""
    }.mkString("{", ",", "}")
    respond(ex, if (status == "unhealthy") 503 else 200,
      s"""{"overall_status":"$status","operational_models":${loaded.size},""" +
        s""""total_expected_models":${Trainer.NumModels},"details":$details}""")
  })

  def start(): ApiServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}
