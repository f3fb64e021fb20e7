package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge => bridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions

/** Scalar / projection expression pack.
  *
  * Re-expresses the reference's transform-stage scalar surface
  * (flask_data_pipes/data_pipes/utils.py, fields.py — see SURVEY.md §2.3)
  * as pure Catalyst `Column` functions: every function here composes
  * built-in, whole-stage-codegen'd expressions (no UDFs), so predicates
  * and projections built from them stay push-down-able and
  * codegen-friendly at 100 TB scale.
  *
  * Null semantics follow the reference: all string helpers pass nulls
  * through untouched (utils.py guards every transform with
  * `if data is not None`).
  */
object functions {

  // ── case functions (utils.py:104-128; fields.py:30-42) ────────────────

  /** Null-safe lowercase (reference `lowercase`, utils.py:104-110). */
  def lowercase(c: Column): Column = lower(c)

  /** Null-safe uppercase (reference `uppercase`, utils.py:113-119). */
  def uppercase(c: Column): Column = upper(c)

  /** Title-case (reference `titlecase`, utils.py:122-128) — EXACT
    * CPython `str.title()` parity via the native `graft_titlecase`
    * expression (`o'neil` → `O'Neil`, `a1b` → `A1B`, Unicode Lt
    * mapping). The round-1 `initcap` approximation remains as
    * [[titlecaseInitcap]] for whitespace-word semantics. */
  def titlecase(c: Column): Column =
    bridge.column(expressions.TitleCase(bridge.expression(c)))

  /** Whitespace-word title-case (Spark `initcap`) — NOT Python parity;
    * kept for callers who want the Spark-native behavior. */
  def titlecaseInitcap(c: Column): Column = initcap(c)

  // ── null / type recasts (utils.py:131-177) ────────────────────────────

  /** `booler` (utils.py:131-143): case-insensitive
    * {yes,y,1,true,t}→true, {no,n,0,false,f}→false, ''/null→null,
    * anything else raises (reference raises ValueError). NO whitespace
    * trimming — the reference lowercases the raw string, so `' yes '`
    * is invalid (fuzz-locked against the extracted reference fn). */
  def booler(c: Column): Column = {
    val s = lower(c.cast(StringType))
    when(c.isNull || s === "", lit(null).cast(BooleanType))
      .when(s.isin("yes", "y", "1", "true", "t"), lit(true))
      .when(s.isin("no", "n", "0", "false", "f"), lit(false))
      .otherwise(raise_error(concat(lit("booler: invalid boolean string '"),
        c.cast(StringType), lit("'"))).cast(BooleanType))
  }

  /** Like [[booler]] but invalid values → null instead of error — the
    * permissive variant for exploratory scans over dirty data. */
  def boolerLax(c: Column): Column = {
    val s = lower(c.cast(StringType))
    when(s.isin("yes", "y", "1", "true", "t"), lit(true))
      .when(s.isin("no", "n", "0", "false", "f"), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** `recast_null` (utils.py:146-151): empty string → NULL. */
  def recastNull(c: Column): Column = nullif(c, lit(""))

  /** `recast_timestamp` (utils.py:154-160): epoch milliseconds → timestamp. */
  def recastTimestamp(c: Column): Column = timestamp_millis(c.cast(LongType))

  /** `recast_mac` (utils.py:172-177): '-' → ':' in MAC-style strings. */
  def recastMac(c: Column): Column = translate(c, "-", ":")

  // ── IP helpers (utils.py:163-169, 220-224, 204-217) ───────────────────

  /** `recast_ip` IPv4 arm (utils.py:163-169): unsigned 32-bit int →
    * dotted-quad string. Out-of-range / null → null (reference returns
    * null on ValueError). */
  def ipFromInt(c: Column): Column = {
    val v = c.cast(LongType)
    val quad = concat_ws(".",
      shiftrightunsigned(v, 24).bitwiseAND(lit(255L)).cast(StringType),
      shiftrightunsigned(v, 16).bitwiseAND(lit(255L)).cast(StringType),
      shiftrightunsigned(v, 8).bitwiseAND(lit(255L)).cast(StringType),
      v.bitwiseAND(lit(255L)).cast(StringType))
    when(v.isNull || v < 0L || v > 4294967295L, lit(null).cast(StringType))
      .otherwise(quad)
  }

  /** `ip_to_int` (utils.py:220-224): `int(ipaddress.ip_interface(s))`
    * for every value that fits a signed long — all IPv4 (with optional
    * `/prefix`, `/netmask`, `/hostmask` suffix, validated then ignored,
    * exactly like `ip_interface`) plus small IPv6; malformed → null.
    * Native expression: the CPython-parity parser runs ONCE per row
    * inside codegen — the previous pure-Column form re-evaluated its
    * input subtree per reference (regex + 4 splits ⇒ 6×), which
    * dominated q19 under full evaluation. */
  def ipToInt(c: Column): Column =
    bridge.column(expressions.IpToInt(bridge.expression(c)))

  /** Full-range `ip_to_int` parity (IPv4 + 128-bit IPv6) as decimal
    * digit strings — 2^128-1 exceeds LongType and DecimalType(38). */
  def ipToIntBig(c: Column): Column =
    bridge.column(expressions.IpToIntBig(bridge.expression(c)))

  /** Full-range `recast_ip` parity (utils.py:163-169): decimal int
    * digits (or any integral column, cast to string) → dotted quad
    * below 2^32, compressed-form IPv6 up to 2^128-1, else null —
    * `str(ipaddress.ip_address(i))` exactly. */
  def recastIp(c: Column): Column =
    bridge.column(expressions.IpRecast(bridge.expression(c.cast(StringType))))

  /** CIDR host expansion (reference `explode_ip_addrs`, utils.py:204-217):
    * `a.b.c.d/p` → array of every host address in the network (network
    * and broadcast excluded for p<31, matching `ipaddress.hosts()`);
    * plain address → single-element array; invalid → empty array (the
    * reference skips invalid entries). Use with `explode`. Array-based so
    * it stays inside codegen (`sequence` + `transform`). */
  def cidrHosts(c: Column): Column = {
    val slash = split(c, "/")
    val base = ipToInt(element_at(slash, 1))
    val prefix = when(size(slash) === 2, element_at(slash, 2).cast(IntegerType))
      .otherwise(lit(32))
    // 2^(32-p) is exact in double for p∈[0,32]; avoids shiftleft's
    // Int-literal-only bit-count limitation.
    val hostSpan = pow(lit(2.0), (lit(32) - prefix).cast(DoubleType)).cast(LongType)
    val mask = lit(4294967295L) - (hostSpan - 1L)
    val network = base.bitwiseAND(mask)
    val bcast = network.bitwiseOR(mask.bitwiseXOR(lit(4294967295L)))
    val lo = when(prefix >= 31, network).otherwise(network + 1L)
    val hi = when(prefix >= 31, bcast).otherwise(bcast - 1L)
    val ok = base.isNotNull && prefix.between(0, 32) && lo <= hi
    when(ok, transform(sequence(lo, hi), ipFromInt(_)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Generator-based `explode_ip_addrs` (utils.py:204-217) — the scale
    * path for CIDR expansion, IPv4 AND IPv6. Unlike [[cidrHosts]] (an
    * array the row must hold in memory), rows STREAM from a lazy
    * iterator, and a CIDR wider than `maxHosts` fails fast with the
    * offending value named — at 100 TB one dirty `0.0.0.0/0` row must
    * not OOM or hang a stage. Use directly in `select`:
    * `df.select(col("k"), F.explodeCidr(col("cidr")).as("ip"))`. */
  def explodeCidr(c: Column, maxHosts: Long = 1L << 20): Column =
    bridge.column(expressions.CidrHostsGen(bridge.expression(c), maxHosts))

  /** Explode a WARC file (binary column, plain or gzipped) into its
    * records — the web-archive ingestion seam ([EXT]; the reference
    * reads JSONL/CSV only). Generator, so the per-record rows stream
    * inside the plan and downstream status/MIME filters compose with
    * pruning. Corrupt payloads yield zero rows, never a throw. Use in
    * `select`: `df.select(col("k"), F.warcRecords(col("payload")).as("r"))`. */
  def warcRecords(c: Column): Column =
    bridge.column(expressions.WarcRecordsGen(bridge.expression(c)))

  // ── splitters (utils.py:84-101; fields.py:85-105) ─────────────────────

  /** `splitter` (utils.py:84-101): split `domain\\cn` on backslash →
    * struct(left = split[0], right = split[-1]) — EXACTLY the
    * reference: with no backslash `split` returns `[s]`, so BOTH sides
    * are the whole input (not null — fuzz-locked against the extracted
    * reference function). Null input → (null, null) like the
    * AttributeError arm. */
  def splitter(c: Column): Column = {
    val parts = split(c, "\\\\")
    struct(
      element_at(parts, 1).as("left"),
      element_at(parts, -1).as("right"))
  }

  /** `HostName` field (fields.py:85-105) — one input, three outputs,
    * EXACT reference semantics (CPython-derived vectors in
    * OpsFunctionsSpec):
    *  - `DOM\\host[\\…]` → host=upper(v[1]) (the SECOND backslash
    *    segment — `'a\\b\\c'.split('\\')[1]` is `'b'`), domain=v[0]
    *    ORIGINAL case (fields.py:93 stores `v[0]` unchanged; only the
    *    returned host is `.upper()`ed), fqdn=null;
    *  - `host.dom.tld` → host=upper(first label) (`split('.', 1)`),
    *    fqdn=the ORIGINAL full value (fields.py:99), domain=null;
    *  - plain token (no `\\`/`.`) → falls off `_serialize`'s end →
    *    host NULL, domain/fqdn null.
    * Returned as a struct; use [[selectHostName]] to flatten into real
    * columns (SURVEY.md §7 hard part (b)). For the friendlier behavior
    * (upper-cased side outputs, plain passthrough) use
    * [[hostNameLenient]]. */
  def hostName(c: Column): Column = {
    val hasBs = c.contains("\\")
    val hasDot = c.contains(".")
    val bs = split(c, "\\\\")
    struct(
      when(hasBs, upper(element_at(bs, 2)))
        .when(hasDot, upper(element_at(split(c, "\\.", 2), 1)))
        .otherwise(lit(null).cast(StringType)).as("host"),
      when(hasBs, element_at(bs, 1))
        .otherwise(lit(null).cast(StringType)).as("domain"),
      when(not(hasBs) && hasDot, c)
        .otherwise(lit(null).cast(StringType)).as("fqdn"))
  }

  /** Divergent-but-friendlier HostName variant (round-1 behavior, kept
    * behind its own name as SURVEY.md §2.3 D3 does for titlecase):
    * upper-cases the domain/fqdn side outputs, takes the LAST backslash
    * segment as the host, and passes plain tokens through unchanged
    * instead of nulling them. NOT reference parity — see [[hostName]]. */
  def hostNameLenient(c: Column): Column = {
    val hasBs = c.contains("\\")
    val hasDot = c.contains(".")
    val bs = split(c, "\\\\")
    val dots = split(c, "\\.")
    struct(
      when(hasBs, upper(element_at(bs, -1)))
        .when(hasDot, upper(element_at(dots, 1)))
        .otherwise(c).as("host"),
      when(hasBs, upper(element_at(bs, 1)))
        .otherwise(lit(null).cast(StringType)).as("domain"),
      when(not(hasBs) && hasDot, upper(c))
        .otherwise(lit(null).cast(StringType)).as("fqdn"))
  }

  /** Flatten a [[hostName]] struct into `name`, `name_domain`,
    * `name_fqdn` columns on the frame (side-output columns, fields.py
    * `_domain`/`_fqdn` keys). */
  def selectHostName(df: DataFrame, src: String, dst: String): DataFrame = {
    val h = hostName(col(src))
    df.withColumn(dst, h.getField("host"))
      .withColumn(s"${dst}_domain", h.getField("domain"))
      .withColumn(s"${dst}_fqdn", h.getField("fqdn"))
  }

  // ── hashing / naming (utils.py:35-36, 181-192) ────────────────────────

  /** Reference `sha256` — which actually computes SHA-224
    * (utils.py:35-36: `hashlib.sha224`). Kept under an honest name. */
  def sha224(c: Column): Column = sha2(c.cast(StringType), 224)

  /** `camel_to_snake_case` (utils.py:181-192) — EXACT reference
    * semantics via the native `graft_camel_to_snake` expression: only
    * ASCII uppercase runs followed by [a-z0-9] are rewritten and
    * lowercased; everything else passes through (fuzz-locked against
    * the extracted reference function). */
  def camelToSnake(c: Column): Column =
    bridge.column(expressions.CamelToSnakeRef(bridge.expression(c)))

  /** The simplified whole-string-lowercasing variant (round-1 behavior,
    * oracle-expressible in plain SQL — used by q38): acronym-aware
    * split, then `lower` over the WHOLE result. NOT reference parity
    * for non-ASCII/trailing-acronym inputs — see [[camelToSnake]]. */
  def camelToSnakeSimple(c: Column): Column = {
    val acronyms = regexp_replace(c, "([A-Z]+)([A-Z][a-z0-9])", "$1_$2")
    val words = regexp_replace(acronyms, "([a-z0-9])([A-Z])", "$1_$2")
    lower(regexp_replace(words, "^_+", ""))
  }

  // ── dates & times (fields.py:45-82; ext/serializers.py:7-16) ──────────

  /** ISO date serialization (fields.py:45-53). */
  def isoDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Formatted datetime (fields.py:56-69); default ISO-8601 + 'Z' like
    * ext/serializers.py:12-14. */
  def isoDateTime(c: Column, fmt: String = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"): Column =
    date_format(c, fmt)

  /** Time-of-day with µs truncated to ms (fields.py:72-82). */
  def timeMs(c: Column): Column = date_format(c, "HH:mm:ss.SSS")

  // ── JSON (pipeline.py:737-743, 75) ────────────────────────────────────

  /** Per-row JSON field extraction (reference rows are JSON lines). */
  def jsonGet(c: Column, path: String): Column = get_json_object(c, path)

  // ── explode / denormalize (utils.py:39-55; model.py:23-33) ────────────

  /** `denormalize` (utils.py:39-55), the reference's signature relational
    * op: pop the single declared array field and emit one row per
    * element, duplicating the remaining fields. Branch semantics:
    * empty list → ONE row with null (hence `explode_outer`, an exact
    * match); null → one row with null; non-array column → frame returned
    * unchanged (reference leaves non-iterable values alone). */
  def denormalize(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case _: ArrayType => df.withColumn(colName, explode_outer(col(colName)))
      case _            => df
    }

  /** Recursive flatten (utils.py:195-202) for a fixed nesting depth —
    * Spark's `flatten` removes one level per call. */
  def flattenDeep(c: Column, depth: Int): Column =
    (1 until depth).foldLeft(c)((acc, _) => flatten(acc))

  /** Fully-recursive flatten, matching the reference's arbitrary-depth
    * semantics: the nesting depth is STATIC in the schema, so the right
    * number of `flatten` applications is derived from the column's
    * DataType — still a pure Catalyst expression chain, no UDF. */
  def flattenAll(df: DataFrame, colName: String): DataFrame = {
    def depth(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case ArrayType(inner, _) => 1 + depth(inner)
      case _                   => 0
    }
    df.withColumn(colName, flattenDeep(col(colName), depth(df.schema(colName).dataType)))
  }

  // ── writer-layout helpers (pipeline.py:786-792; model.py:57-63) ───────

  /** Derive the reference's dated partition layout columns
    * (`<stage>/<dir>/YYYY/MM/DD/...`) from a timestamp column, for
    * `df.write.partitionBy("year","month","day")`. */
  def datedPartitions(df: DataFrame, ts: String): DataFrame =
    df.withColumn("year", year(col(ts)))
      .withColumn("month", month(col(ts)))
      .withColumn("day", dayofmonth(col(ts)))

  /** `inflection.tableize` equivalent for default sink naming
    * (model.py:57-59): CamelCase class name → snake_case plural-ish
    * table name. Plain Scala (driver-side naming, not a Column fn). */
  def tableize(name: String): String = {
    val snake = name
      .replaceAll("([A-Z]+)([A-Z][a-z0-9])", "$1_$2")
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .toLowerCase
    if (snake.endsWith("s")) snake + "es"
    else if (snake.endsWith("y") && !snake.matches(".*[aeiou]y$"))
      snake.dropRight(1) + "ies"
    else snake + "s"
  }
}
