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

  test("nested sub-model reshapes struct members (marshmallow Nested)") {
    val df = Seq((1L, ("ada", 42.5)), (2L, ("alan", 7.25)))
      .toDF("id", "person")
    val person = Model("Person", Seq(
      Field("name_upper", source = Some("_1"), transform = F.uppercase),
      Field("score", source = Some("_2"),
        cast = Some(org.apache.spark.sql.types.LongType))))
    val m = Model("Rec", Seq(
      Field("id"),
      Field("who", source = Some("person"), nested = Some(person))))
    val out = m.compile(df).orderBy("id").collect()
    val row1 = out(0).getStruct(1)
    assert(row1.getString(0) === "ADA" && row1.getLong(1) === 42L)
    assert(m.compile(df).schema("who").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("name_upper", "score"))
    // version hash sees nested declaration changes
    val changed = Model("Rec", Seq(
      Field("id"),
      Field("who", source = Some("person"), nested = Some(
        person.copy(fields = person.fields.map {
          case f if f.name == "name_upper" => f.copy(transform = F.lowercase)
          case f => f
        })))))
    assert(changed.versionHash !== m.versionHash)
    // nested models must not declare denormalize
    intercept[ModelDeclarationError] {
      Model("Bad", Seq(Field("who", nested = Some(
        Model("Sub", Seq(Field("xs", denormalize = true)))))))
    }
  }

  test("fieldtypes: uuid/email/url validate lax (null) and strict (raise)") {
    import graft.model.{fieldtypes => FT}
    def run(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        vals: String*): Seq[String] =
      vals.toDF("v").select(f(col("v"))).collect().toSeq
        .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(run(FT.uuid(_), "123e4567-e89b-12d3-a456-426614174000", "nope")
      === Seq("123e4567-e89b-12d3-a456-426614174000", null))
    assert(run(FT.email(_), "ada.lovelace@mycompany.com", "not-an-email", "a@b")
      === Seq("ada.lovelace@mycompany.com", null, null))
    assert(run(FT.url(_), "https://example.com/x", "ftp://host:21/f", "example.com")
      === Seq("https://example.com/x", "ftp://host:21/f", null))
    val e = intercept[Exception] {
      Seq("nope").toDF("v").select(FT.uuid(col("v"), strict = true)).collect()
    }
    assert(e.getMessage.contains("uuid") ||
      Option(e.getCause).exists(_.getMessage.contains("uuid")))
  }

  test("fieldtypes: timedelta seconds round-trip (marshmallow TimeDelta)") {
    import graft.model.{fieldtypes => FT}
    val secs = Seq(90061L).toDF("s")
      .select(FT.timeDeltaToSeconds(FT.timeDeltaFromSeconds(col("s"))))
      .collect()(0).getLong(0)
    assert(secs === 90061L)
  }
}
