package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.model.{Field, Model}
import graft.ops.{functions => F}

/** Pipeline-level golden-file tests (SURVEY.md §5.4): fixture JSONL in,
  * staged run, byte-level compare of the transformed JSONL against the
  * FIXTURES.md §2 expected outputs.
  */
class GoldenFileSpec extends SparkSuite {

  test("users fixture: transformed JSONL matches the golden lines (FIXTURES.md §2.1)") {
    val dir = Files.createTempDirectory("graft-golden").toString
    Files.writeString(java.nio.file.Paths.get(dir, "users.jsonl"),
      """{"first": "ada", "last": "lovelace", "birthday": "1815-12-10", "profile": "https://example.com/ada", "tags": ["math", "pioneer"]}""" + "\n")

    val users = Model("User", Seq(
      Field("first", transform = F.uppercase),
      Field("last", transform = F.uppercase),
      Field("email", computed = Some(concat(
        lower(col("first")), lit("."), lower(col("last")), lit("@mycompany.com")))),
      Field("birthday", cast = Some(DateType), transform = F.isoDate),
      Field("profile"),
      Field("tags", denormalize = true)))

    val out = users.compile(io.Sources.jsonl(spark, Seq(s"$dir/users.jsonl")))
      .orderBy("tags")
    io.Sinks.jsonl(out.coalesce(1), s"$dir/out", compress = false)

    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".json")).get
    val lines = Files.readAllLines(part.toPath)
    // Spark writes compact JSON (no space after ':'); golden lines from
    // FIXTURES.md normalized the same way for a byte-level compare.
    val golden = Seq(
      """{"first":"ADA","last":"LOVELACE","email":"ada.lovelace@mycompany.com","birthday":"1815-12-10","profile":"https://example.com/ada","tags":"math"}""",
      """{"first":"ADA","last":"LOVELACE","email":"ada.lovelace@mycompany.com","birthday":"1815-12-10","profile":"https://example.com/ada","tags":"pioneer"}""")
    assert(lines.toArray.toSeq === golden)
  }

  test("hosts fixture: network recasts match expected values (FIXTURES.md §2.2)") {
    import spark.implicits._
    val rows = Seq(
      ("CORP\\web01", 3232235777L, "aa-bb-cc-dd-ee-ff",
        Some(1700000000000L), "Yes", "", "10.0.0.0/30"),
      ("db02.corp.example.com", 167772161L, "11-22-33-44-55-66",
        None, "0", "ok", "192.168.1.5/32"))
      .toDF("host", "ip", "mac", "seen_ms", "active", "note", "cidr")

    val out = F.selectHostName(rows, "host", "hostname")
      .select(
        col("hostname"), col("hostname_domain"), col("hostname_fqdn"),
        F.ipFromInt(col("ip")).as("ip_str"),
        F.recastMac(col("mac")).as("mac_n"),
        F.isoDateTime(F.recastTimestamp(col("seen_ms")),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("seen"),
        F.booler(col("active")).as("active_b"),
        F.recastNull(col("note")).as("note_n"),
        F.cidrHosts(col("cidr")).as("hosts"))
      .collect()

    val r1 = out(0)
    assert(r1.getAs[String]("hostname") === "WEB01")
    assert(r1.getAs[String]("hostname_domain") === "CORP")
    assert(r1.getAs[String]("ip_str") === "192.168.1.1")
    assert(r1.getAs[String]("mac_n") === "aa:bb:cc:dd:ee:ff")
    assert(r1.getAs[String]("seen") === "2023-11-14T22:13:20Z")
    assert(r1.getAs[Boolean]("active_b") === true)
    assert(r1.getAs[String]("note_n") === null)
    assert(r1.getSeq[String](8) === Seq("10.0.0.1", "10.0.0.2"))

    val r2 = out(1)
    assert(r2.getAs[String]("hostname") === "DB02")
    // FIXTURES.md §2.2: _fqdn keeps the ORIGINAL case (fields.py:99)
    assert(r2.getAs[String]("hostname_fqdn") === "db02.corp.example.com")
    assert(r2.getAs[String]("ip_str") === "10.0.0.1")
    assert(r2.getAs[String]("seen") === null)
    assert(r2.getAs[Boolean]("active_b") === false)
    assert(r2.getAs[String]("note_n") === "ok")
    assert(r2.getSeq[String](8) === Seq("192.168.1.5"))
  }

  test("uploads.csv fixture: DictReader semantics then typed transform (FIXTURES.md §2.3)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(dir, "uploads.csv"),
      "id,name,amount,when\n1,Alpha,10.5,2024-01-01\n2,beta,,2024-01-02\n")
    val raw = io.Sources.csv(spark, Seq(s"$dir/uploads.csv"))
    assert(raw.schema.fields.forall(_.dataType.typeName === "string"))
    val typed = raw.select(
      col("id").cast("long").as("id"),
      F.titlecase(col("name")).as("name"),
      F.recastNull(col("amount")).cast("double").as("amount"),
      col("when").cast("date").as("when"))
      .orderBy("id").collect()
    assert(typed(0).getAs[Double]("amount") === 10.5)
    assert(typed(1).isNullAt(2)) // '' → null → null double
    assert(typed(1).getAs[String]("name") === "Beta")
  }
}
