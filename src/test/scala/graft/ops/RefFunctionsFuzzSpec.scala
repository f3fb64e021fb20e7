package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.{functions => F}

/** Differential fuzz against the REFERENCE'S OWN function bodies:
  * `camel_to_snake_case`, `titlecase`, `lowercase`, `uppercase`,
  * `booler`, `recast_mac` are ast-extracted from
  * /root/reference/flask_data_pipes/data_pipes/utils.py (the module
  * itself has Flask-era imports that no longer resolve; the extracted
  * functions are pure) and executed under CPython over 1500 seeded
  * random strings. The engine's Column functions must agree exactly.
  * Skipped (not failed) where python3 is unavailable. */
class RefFunctionsFuzzSpec extends SparkSuite {
  import spark.implicits._

  private def python3Available: Boolean =
    try new ProcessBuilder("python3", "-c", "import ast").start().waitFor() == 0
    catch { case _: Exception => false }

  private val refPath = "/root/reference/flask_data_pipes/data_pipes/utils.py"

  test("scalar pack agrees with the extracted reference functions on fuzzed inputs") {
    assume(python3Available, "python3 not available")
    assume(Files.exists(java.nio.file.Paths.get(refPath)), "reference not present")

    val rng = new scala.util.Random(42424242L)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val pools = Seq(
      alpha, alpha.toUpperCase, "0123456789", "_-'. :\\/", "éÉǆß",
      "YESNOyesno01tfTF")
    def randString(): String = {
      val len = rng.nextInt(24)
      (0 until len).map { _ =>
        val pool = pools(rng.nextInt(pools.length))
        pool(rng.nextInt(pool.length))
      }.mkString
    }
    def camelish(): String =
      (0 until 1 + rng.nextInt(4)).map { _ =>
        val w = (0 until 1 + rng.nextInt(6)).map(_ => alpha(rng.nextInt(26))).mkString
        if (rng.nextBoolean()) w.capitalize
        else if (rng.nextInt(3) == 0) w.toUpperCase
        else w
      }.mkString + (if (rng.nextInt(4) == 0) rng.nextInt(100).toString else "")
    val boolerish = Seq("yes", "Y", "1", "TRUE", "t", "no", "N", "0", "False",
      "f", " yes ", "ja", "2", "", "truthy")
    val inputs = ((1 to 900).map(_ => randString()) ++
      (1 to 500).map(_ => camelish()) ++ boolerish).distinct
      .filterNot(s => s.exists(_ < ' ')) // keep JSON-line transport simple

    val inFile = Files.createTempFile("reffuzz", ".json")
    Files.write(inFile,
      inputs.map(s => com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().writeValueAsString(s)).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))

    val script =
      s"""import ast, json, re, sys
         |src = open("$refPath", encoding="utf-8").read()
         |tree = ast.parse(src)
         |wanted = {"camel_to_snake_case", "titlecase", "lowercase",
         |          "uppercase", "booler", "recast_mac", "splitter"}
         |ns = {"re": re}
         |for node in tree.body:
         |    if isinstance(node, ast.FunctionDef) and node.name in wanted:
         |        mod = ast.Module(body=[node], type_ignores=[])
         |        exec(compile(mod, "<ref>", "exec"), ns)
         |out = []
         |for line in open(sys.argv[1], encoding="utf-8"):
         |    s = json.loads(line)
         |    def safe(f, v):
         |        try:
         |            r = f(v)
         |            return None if r is None else (r if isinstance(r, bool) else str(r))
         |        except ValueError:
         |            return "<VALUE_ERROR>"
         |    out.append({
         |        "in": s,
         |        "snake": safe(ns["camel_to_snake_case"], s),
         |        "title": safe(ns["titlecase"], s),
         |        "lower": safe(ns["lowercase"], s),
         |        "upper": safe(ns["uppercase"], s),
         |        "booler": safe(ns["booler"], s),
         |        "mac": safe(ns["recast_mac"], s),
         |        "sleft": safe(lambda v: ns["splitter"](v, left=True), s),
         |        "sright": safe(lambda v: ns["splitter"](v, right=True), s)})
         |print(json.dumps(out))
         |""".stripMargin
    val scriptFile = Files.createTempFile("reffuzz", ".py")
    Files.write(scriptFile, script.getBytes(StandardCharsets.UTF_8))
    val proc = new ProcessBuilder("python3", scriptFile.toString, inFile.toString)
      .start()
    val raw = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val errTxt = new String(proc.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(proc.waitFor() == 0, errTxt)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val expected = mapper.readTree(raw)

    val got = inputs.toDF("v").select(
        col("v"),
        F.camelToSnake(col("v")).as("snake"),
        F.titlecase(col("v")).as("title"),
        F.lowercase(col("v")).as("lower"),
        F.uppercase(col("v")).as("upper"),
        F.boolerLax(col("v")).as("booler"),
        F.recastMac(col("v")).as("mac"),
        F.splitter(col("v")).getField("left").as("sleft"),
        F.splitter(col("v")).getField("right").as("sright"))
      .collect().map(r => r.getString(0) -> r).toMap

    var checked = 0
    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until expected.size()).foreach { i =>
      val e = expected.get(i)
      val in = e.get("in").asText()
      val r = got(in)
      def str(field: String): String =
        if (r.isNullAt(r.fieldIndex(field))) null else r.get(r.fieldIndex(field)).toString
      def exp(field: String): String =
        if (e.get(field).isNull) null else e.get(field).asText()
      // booler: reference raises on invalid; the engine's lax arm nulls.
      val expBooler = exp("booler") match {
        case "<VALUE_ERROR>" => null
        case "true" | "True" => "true"
        case "false" | "False" => "false"
        case other => other
      }
      Seq("snake" -> exp("snake"), "title" -> exp("title"),
        "lower" -> exp("lower"), "upper" -> exp("upper"),
        "mac" -> exp("mac"), "booler" -> expBooler,
        "sleft" -> exp("sleft"), "sright" -> exp("sright")).foreach { case (field, want) =>
        val g = str(field)
        if (g != want) diffs += s"'$in' $field: engine=$g reference=$want"
        checked += 1
      }
    }
    assert(checked > 5000)
    assert(diffs.isEmpty,
      s"${diffs.length} divergences, first 10:\n${diffs.take(10).mkString("\n")}")
  }
}
