package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The marshmallow field-type surface (fields.py:3-25 re-exports) as
  * Spark casts/validators — the SURVEY §2.2 mapping table made
  * callable. Primitive types are plain casts (`Field(cast=…)`);
  * format-bearing string types (`UUID`, `Email`, `Url`) get validating
  * transforms with the engine's two-arm convention (see `booler`):
  * the lax arm nulls invalid values, the strict arm raises — marshmallow
  * validates on load and passes through on dump, so LAX is the
  * dump-parity default and strict is the load-side check.
  *
  * The Email/URL grammars are deliberately the practical subsets
  * (documented per function), not the full RFCs — same posture as
  * marshmallow's own regex validators.
  */
object fieldtypes {

  /** marshmallow `UUID` (fields.py:9): canonical 8-4-4-4-12 hex form. */
  val UuidPattern: String =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** marshmallow `Email` (fields.py:18): local@domain.tld with the
    * common local-part charset; no quoted locals or IP domains. */
  val EmailPattern: String =
    "^[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+$"

  /** marshmallow `Url` (fields.py:16-17): absolute http(s)/ftp URL with
    * a host; relative URLs rejected (marshmallow default relative=False). */
  val UrlPattern: String =
    "^(https?|ftp)://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\\s]*)?$"

  private def validated(c: Column, pattern: String, what: String,
      strict: Boolean): Column =
    if (strict)
      when(c.isNull || c.rlike(pattern), c)
        .otherwise(raise_error(concat(
          lit(s"$what: invalid value '"), c.cast(StringType), lit("'")))
          .cast(StringType))
    else when(c.rlike(pattern), c).otherwise(lit(null).cast(StringType))

  /** `UUID` field transform: canonical-form check. */
  def uuid(c: Column, strict: Boolean = false): Column =
    validated(c, UuidPattern, "uuid", strict)

  /** `Email` field transform. */
  def email(c: Column, strict: Boolean = false): Column =
    validated(c, EmailPattern, "email", strict)

  /** `Url`/`URL` field transform. */
  def url(c: Column, strict: Boolean = false): Column =
    validated(c, UrlPattern, "url", strict)

  /** marshmallow `TimeDelta` (fields.py:15): integer seconds ↔
    * `DayTimeIntervalType` (the reference serializes timedeltas as
    * total seconds). */
  def timeDeltaFromSeconds(c: Column): Column =
    make_dt_interval(lit(0), lit(0), lit(0), c.cast(DecimalType(18, 6)))

  def timeDeltaToSeconds(c: Column): Column =
    c.cast(DayTimeIntervalType()).cast(LongType)

  // primitive-type casts, named after their marshmallow counterparts —
  // use as Field(cast = fieldtypes.IntegerType) etc.
  val StringT: DataType = StringType
  val IntegerT: DataType = LongType
  val NumberT: DataType = DoubleType
  val DecimalT: DataType = DecimalType(38, 18)
  val BooleanT: DataType = BooleanType
}
