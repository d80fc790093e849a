package graft.sources

import org.apache.spark.sql.types._

/** MariaDB DDL type → Spark type mapping (SURVEY §1.2; reference type
  * system `datatypes/mcs_datatype_basic.h:53-86`, DDL grammar
  * `dbcon/ddlpackage/ddl.y`, catalog `dbcon/execplan/
  * calpontsystemcatalog.h`).
  *
  * Unsigned integers widen to the next signed type (UBIGINT →
  * DECIMAL(20,0), the only lossless container); DATETIME (no TZ) →
  * TimestampNTZ; TIMESTAMP (TZ-shifted) → Timestamp; TIME has no
  * Spark type → string 'HH:MM:SS' plus the SEC_TO_TIME/TIME_TO_SEC
  * function surface; DECIMAL carries precision/scale through (max 38,
  * same 128-bit ceiling as the reference's `mcs_decimal.h`
  * INT128MAXPRECISION).
  */
object TypeMapper {

  final case class ColumnDef(name: String, dataType: DataType, nullable: Boolean, raw: String)

  private val DecimalRe = """(?i)(?:DECIMAL|NUMERIC|FIXED)\s*(?:\((\d+)\s*(?:,\s*(\d+))?\))?.*""".r
  private val SizedRe = """(?i)(\w+)\s*(?:\(\s*(\d+)\s*\))?.*""".r

  /** MariaDB locale-tailored collation language → ICU locale
    * (utils/common/collation.h names like utf8mb4_turkish_ci).
    * `swedish` is DELIBERATELY absent (ADVICE r13): MariaDB's
    * latin1/utf8_swedish_ci equates v=w at primary strength, but
    * CLDR/ICU Swedish (post-2006 spelling reform) separates them —
    * and latin1_swedish_ci is MySQL's ubiquitous latin1 DEFAULT, so
    * mapping it to ICU sv would silently change ordering for legacy
    * tables with no Swedish intent. It falls back to UTF8_LCASE like
    * german2/spanish2 (docs/COMPAT.md collation section). */
  private[sources] val localeCollations: Map[String, String] = Map(
    "turkish" -> "tr", "danish" -> "da",
    "polish" -> "pl", "czech" -> "cs", "hungarian" -> "hu",
    "spanish" -> "es", "romanian" -> "ro", "slovak" -> "sk",
    "slovenian" -> "sl", "lithuanian" -> "lt", "latvian" -> "lv",
    "estonian" -> "et", "croatian" -> "hr", "icelandic" -> "is",
    "vietnamese" -> "vi", "persian" -> "fa")

  /** Map one MariaDB type expression (e.g. "INT UNSIGNED",
    * "DECIMAL(18,2)", "VARCHAR(64)") to a Spark DataType. */
  def toSparkType(sqlType: String): DataType = {
    val t = sqlType.trim
    val u = """(?i).*\bUNSIGNED\b.*""".r.matches(t)
    // MariaDB per-column collation (utils/common/collation.h): *_ci
    // collations map to Spark's UTF8_LCASE collated string type, so
    // comparisons, grouping, and sorts through the whole Catalyst
    // stack become case-insensitive without any query rewrite;
    // *_bin / unspecified keep the UTF8_BINARY default. LOCALE-
    // TAILORED *_<language>_ci collations (utf8_turkish_ci's dotted-i,
    // utf8_danish_ci's aa=å, ...) map to the matching ICU locale
    // collation at case-insensitive strength — the tailorings Spark's
    // ICU integration carries natively (gated by q_collation_tr).
    // Languages whose MariaDB tailoring ICU does NOT deliver
    // (esperanto, roman, sinhala, spanish2/german2 variant
    // tailorings, swedish's pre-reform v=w) fall back to
    // UTF8_LCASE; docs/COMPAT.md lists the fallbacks.
    val collation = """(?i).*\bCOLLATE\s+(\w+).*""".r.findFirstMatchIn(t)
      .map(_.group(1).toLowerCase)
    def str: DataType = collation match {
      case Some(c) if c.endsWith("_ci") =>
        val icu = TypeMapper.localeCollations.collectFirst {
          case (lang, locale) if c.endsWith(s"_${lang}_ci") => locale
        }
        StringType(icu.map(l => s"${l}_CI").getOrElse("UTF8_LCASE"))
      case _ => StringType
    }
    t match {
      case DecimalRe(p, s) =>
        val prec = Option(p).map(_.toInt).getOrElse(10)
        val scale = Option(s).map(_.toInt).getOrElse(0)
        require(prec <= 38, s"DECIMAL precision $prec exceeds 38 (reference int128 ceiling)")
        DecimalType(prec, scale)
      case SizedRe(base, _) =>
        base.toUpperCase match {
          case "TINYINT" => if (u) ShortType else ByteType
          case "SMALLINT" => if (u) IntegerType else ShortType
          case "MEDIUMINT" => IntegerType // fits in int either way
          case "INT" | "INTEGER" => if (u) LongType else IntegerType
          case "BIGINT" => if (u) DecimalType(20, 0) else LongType
          case "FLOAT" => FloatType
          case "DOUBLE" | "REAL" => DoubleType
          case "BIT" | "BOOLEAN" | "BOOL" => BooleanType
          case "CHAR" | "VARCHAR" | "TEXT" | "TINYTEXT" | "MEDIUMTEXT" | "LONGTEXT" |
               "CLOB" | "ENUM" | "SET" | "JSON" => str
          case "BINARY" | "VARBINARY" | "BLOB" | "TINYBLOB" | "MEDIUMBLOB" | "LONGBLOB" =>
            BinaryType
          case "DATE" => DateType
          case "DATETIME" => TimestampNTZType // no TZ in MariaDB DATETIME
          case "TIMESTAMP" => TimestampType // TZ-shifted (ha_tzinfo.cpp)
          case "TIME" => StringType // no Spark TIME type; see MySqlFunctions
          case "YEAR" => ShortType
          case other => throw new IllegalArgumentException(s"unsupported type: $other")
        }
      case other => throw new IllegalArgumentException(s"cannot parse type: $other")
    }
  }

  /** Parse the column list of a `CREATE TABLE t (...)` DDL-ish string
    * into a StructType. Accepts bare column lists too. Understands
    * NOT NULL / NULL; ignores DEFAULT/COMMENT tails and table-level
    * PRIMARY KEY/KEY clauses. */
  def parseDdl(ddl: String): StructType = {
    val body = {
      val m = """(?is).*?CREATE\s+TABLE\s+\S+\s*\((.*)\)\s*;?\s*""".r
      ddl match {
        case m(inner) => inner
        case _ => ddl
      }
    }
    // split top-level commas (not inside parens)
    val cols = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    body.foreach {
      case ',' if depth == 0 => cols += cur.toString; cur.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur.append(c)
    }
    if (cur.nonEmpty) cols += cur.toString

    val fields = cols.map(_.trim).filter(_.nonEmpty)
      .filterNot(c => """(?i)^(PRIMARY\s+KEY|UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN\s+KEY).*""".r.matches(c))
      .map { colDef =>
        val parts = colDef.split("\\s+", 2)
        require(parts.length == 2, s"cannot parse column def: $colDef")
        val name = parts(0).stripPrefix("`").stripSuffix("`")
        val rest = parts(1)
        val notNull = """(?i).*\bNOT\s+NULL\b.*""".r.matches(rest)
        // type = leading token(s) up to a constraint keyword
        val typeStr = rest.split("""(?i)\s+(NOT\s+NULL|NULL|DEFAULT|PRIMARY|UNIQUE|COMMENT|AUTO_INCREMENT)""")(0)
        StructField(name, toSparkType(typeStr), nullable = !notNull)
      }
    StructType(fields.toSeq)
  }
}
