package graft.model

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite
import graft.ops.{functions => F}

class ModelSpec extends SparkSuite {
  import spark.implicits._

  private val raw = Seq(
    ("ada", "lovelace", "1815-12-10", Seq("math", "pioneer")),
    ("alan", "turing", "1912-06-23", Seq.empty[String])
  ).toDF("first", "last", "birthday", "tags")

  // The README's canonical users model (README.md:100-119; FIXTURES.md §2.1)
  private val users = Model("User", Seq(
    Field("first", transform = F.uppercase),
    Field("last", transform = F.uppercase),
    Field("email", computed = Some(concat(
      lower(col("first")), lit("."), lower(col("last")), lit("@mycompany.com")))),
    Field("birthday", cast = Some(DateType), transform = F.isoDate),
    Field("source_tag", constant = Some("etl")),
    Field("tags", denormalize = true)))

  test("compile: projection + rename + cast + computed + constant + explode") {
    val out = users.compile(raw).orderBy("first", "tags").collect()
    // ada has 2 tags → 2 rows; alan empty → 1 row with null (F1 semantics)
    assert(out.length === 3)
    assert(out(0).getAs[String]("first") === "ADA")
    assert(out(0).getAs[String]("email") === "ada.lovelace@mycompany.com")
    assert(out(0).getAs[String]("birthday") === "1815-12-10")
    assert(out(0).getAs[String]("source_tag") === "etl")
    assert(Set(out(0).getAs[String]("tags"), out(1).getAs[String]("tags"))
      === Set("math", "pioneer"))
    assert(out(2).getAs[String]("first") === "ALAN")
    assert(out(2).getAs[String]("tags") === null)
  }

  test("compile emits only declared fields (column pruning by construction)") {
    assert(users.compile(raw).columns.toSeq
      === Seq("first", "last", "email", "birthday", "source_tag", "tags"))
  }

  test("at most one denormalized field (model.py:28-30)") {
    val e = intercept[ModelDeclarationError] {
      Model("Bad", Seq(Field("a", denormalize = true), Field("b", denormalize = true)))
    }
    assert(e.getMessage.contains("denormalized"))
    intercept[ModelDeclarationError] {
      Model("Dup", Seq(Field("a"), Field("a")))
    }
  }

  test("naming defaults (model.py:57-63)") {
    assert(users.tableName === "users")
    assert(Model("UserProfile", Seq(Field("x"))).tableName === "user_profiles")
    assert(Model("User", Seq(Field("x")), filename = Some("custom")).tableName === "custom")
  }

  test("versionHash: stable, sensitive to declaration changes (pipeline.py:176-221)") {
    val h1 = users.versionHash
    assert(h1 === users.versionHash)
    assert(h1.length === 56) // sha224 hex
    val changed = users.copy(fields = users.fields.map {
      case f if f.name == "first" => f.copy(transform = F.lowercase)
      case f => f
    })
    assert(changed.versionHash !== h1)
  }

  test("source rename reaches into struct paths") {
    val nested = Seq((("x", 1), "k")).toDF("s", "k")
    val m = Model("N", Seq(Field("inner", source = Some("s._1"))))
    assert(m.compile(nested).collect()(0).getString(0) === "x")
  }
}
