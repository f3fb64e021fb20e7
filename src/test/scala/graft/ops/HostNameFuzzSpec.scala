package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.{functions => F}

/** Differential fuzz of [[functions.hostName]] against the reference's
  * ACTUAL `HostName._serialize` method (fields.py:85-105), ast-extracted
  * from inside the class body and executed under CPython with a stub
  * object capturing the `_domain`/`_fqdn` side outputs. 1200 seeded
  * strings mixing backslashes, dots, mixed case, digits and punctuation.
  * Skipped (not failed) where python3 is unavailable. */
class HostNameFuzzSpec extends SparkSuite {
  import spark.implicits._

  private def python3Available: Boolean =
    try new ProcessBuilder("python3", "-c", "import ast").start().waitFor() == 0
    catch { case _: Exception => false }

  private val refPath = "/root/reference/flask_data_pipes/data_pipes/fields.py"

  test("hostName agrees with the extracted HostName._serialize on fuzzed inputs") {
    assume(python3Available, "python3 not available")
    assume(Files.exists(java.nio.file.Paths.get(refPath)), "reference not present")

    val rng = new scala.util.Random(777777L)
    val atoms = Seq("corp", "CORP", "Web01", "db", "example", "COM", "x9", "ǆé")
    def piece(): String = atoms(rng.nextInt(atoms.length))
    val inputs = (1 to 1200).map { _ =>
      rng.nextInt(6) match {
        case 0 => piece() + "\\" + piece()
        case 1 => (1 to 2 + rng.nextInt(3)).map(_ => piece()).mkString(".")
        case 2 => piece()
        case 3 => piece() + "\\" + piece() + "\\" + piece()
        case 4 => // mixed separators / edges
          Seq(piece() + "." + piece() + "\\" + piece(), "\\" + piece(),
            piece() + "\\", "." + piece(), piece() + ".", "\\", ".",
            "")(rng.nextInt(8))
        case _ => piece() + "\\" + piece() + "." + piece()
      }
    }.distinct

    val inFile = Files.createTempFile("hostfuzz", ".json")
    Files.write(inFile,
      inputs.map(s => com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().writeValueAsString(s)).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))

    val script =
      s"""import ast, json, sys
         |src = open("$refPath", encoding="utf-8").read()
         |tree = ast.parse(src)
         |fn = None
         |for node in tree.body:
         |    if isinstance(node, ast.ClassDef) and node.name == "HostName":
         |        for sub in node.body:
         |            if isinstance(sub, ast.FunctionDef) and sub.name == "_serialize":
         |                fn = sub
         |assert fn is not None
         |ns = {}
         |exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
         |class Obj: pass
         |out = []
         |for line in open(sys.argv[1], encoding="utf-8"):
         |    v = json.loads(line)
         |    obj = Obj()
         |    host = ns["_serialize"](None, v, None, obj)
         |    out.append({"in": v, "host": host,
         |                "domain": getattr(obj, "_domain", None),
         |                "fqdn": getattr(obj, "_fqdn", None)})
         |print(json.dumps(out))
         |""".stripMargin
    val scriptFile = Files.createTempFile("hostfuzz", ".py")
    Files.write(scriptFile, script.getBytes(StandardCharsets.UTF_8))
    val proc = new ProcessBuilder("python3", scriptFile.toString, inFile.toString)
      .start()
    val raw = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val errTxt = new String(proc.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(proc.waitFor() == 0, errTxt)
    val expected = new com.fasterxml.jackson.databind.ObjectMapper().readTree(raw)

    val got = inputs.toDF("v")
      .select(col("v"), F.hostName(col("v")).as("h"))
      .select(col("v"), col("h.host"), col("h.domain"), col("h.fqdn"))
      .collect().map(r => r.getString(0) -> r).toMap

    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until expected.size()).foreach { i =>
      val e = expected.get(i)
      val in = e.get("in").asText()
      val r = got(in)
      def str(idx: Int): String = if (r.isNullAt(idx)) null else r.getString(idx)
      def exp(f: String): String = if (e.get(f).isNull) null else e.get(f).asText()
      Seq(1 -> "host", 2 -> "domain", 3 -> "fqdn").foreach { case (idx, f) =>
        if (str(idx) != exp(f))
          diffs += s"'$in' $f: engine=${str(idx)} reference=${exp(f)}"
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.length} divergences, first 10:\n${diffs.take(10).mkString("\n")}")
  }
}
