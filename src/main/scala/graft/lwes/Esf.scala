package graft.lwes

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** One attribute declaration from an ESF event template.
  *
  * `token` is the LWES wire token the declared type maps to (array
  * declarations carry the array token). `required`/`nullable` are the
  * modern ESF qualifiers; `arrayLen` is the declared max element count
  * (schema-irrelevant, kept for write-side validation); `default` is
  * the raw default-value literal, recorded verbatim.
  */
final case class EsfAttr(name: String, typeName: String, token: Byte,
    required: Boolean, nullable: Boolean, arrayLen: Option[Int],
    default: Option[String])

/** A parsed `.esf` template database — the lwes ecosystem's schema
  * declaration (lwes.org Event Specification Format; lwes-java
  * `EventTemplateDB`). The reference deployment got its schema from
  * Hive DDL instead (reference README:41-59); real lwes deployments
  * keep `.esf` files, and this is the Spark-side consumer for them:
  * `spark.read.format("lwes").option("esf", path)` derives the
  * DataFrame schema from the template, and the write path validates
  * rows against it.
  *
  * `MetaEventInfo` is the standard meta-template whose attributes are
  * shared by every event (the lwes-java semantics); [[attrsFor]]
  * returns an event's own declarations first, then unshadowed meta
  * attributes, both in declaration order.
  */
final case class EsfTemplateDb(events: ListMap[String, Seq[EsfAttr]])
    extends Serializable {

  def meta: Seq[EsfAttr] = events.getOrElse(Esf.MetaEvent, Nil)

  /** Event names declared by the template (meta excluded). */
  def eventNames: Seq[String] =
    events.keys.filterNot(_ == Esf.MetaEvent).toSeq

  /** Declared + unshadowed meta attributes for one event, in
    * declaration order; None when the template doesn't declare it. */
  def attrsFor(event: String): Option[Seq[EsfAttr]] =
    events.get(event).map { own =>
      val shadowed = own.map(_.name).toSet
      own ++ meta.filterNot(a => shadowed(a.name))
    }

  def attrMapFor(event: String): Option[Map[String, EsfAttr]] =
    attrsFor(event).map(_.map(a => a.name -> a).toMap)
}

/** Parser for the public ESF grammar:
  *
  * {{{
  * # comment to end of line
  * EventName
  * {
  *   type attrName;                # classic declaration
  *   type listName[20];            # array with max length
  *   required type attrName;       # modern qualifiers
  *   nullable type listName[5];
  *   type attrName = <literal>;    # default value
  * }
  * }}}
  *
  * Types: `uint16 int16 uint32 int32 int64 uint64 boolean string
  * ip_addr byte float double` (the lwes-java TypeID names; `ipaddr` is
  * accepted as an alias). Parse errors carry line numbers and the
  * offending token — a template typo should read as a template typo.
  */
object Esf {

  val MetaEvent = "MetaEventInfo"

  /** Declared-type name → scalar wire token. */
  val TypeTokens: Map[String, Byte] = Map(
    "uint16" -> LwesType.UInt16, "int16" -> LwesType.Int16,
    "uint32" -> LwesType.UInt32, "int32" -> LwesType.Int32,
    "string" -> LwesType.Str, "ip_addr" -> LwesType.IpAddr,
    "ipaddr" -> LwesType.IpAddr, "int64" -> LwesType.Int64,
    "uint64" -> LwesType.UInt64, "boolean" -> LwesType.Bool,
    "byte" -> LwesType.ByteT, "float" -> LwesType.Float,
    "double" -> LwesType.Double)

  private val Qualifiers = Set("required", "optional", "nullable")

  private final case class Tok(text: String, line: Int)

  private def tokenize(text: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var line = 1
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n') { line += 1; i += 1 }
      else if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && text.charAt(i) != '\n') i += 1 }
      else if (c == '{' || c == '}' || c == ';' || c == '[' || c == ']' ||
          c == '=') { out += Tok(c.toString, line); i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (i < n && text.charAt(i) != '"') {
          if (text.charAt(i) == '\n') line += 1
          sb += text.charAt(i); i += 1
        }
        if (i >= n) throw new IllegalArgumentException(
          s"esf parse error: unterminated string literal at line $line")
        sb += '"'; i += 1
        out += Tok(sb.toString, line)
      } else {
        val start = i
        while (i < n && !text.charAt(i).isWhitespace &&
            !"{};[]=#\"".contains(text.charAt(i))) i += 1
        out += Tok(text.substring(start, i), line)
      }
    }
    out.result()
  }

  def parse(text: String): EsfTemplateDb = {
    val toks = tokenize(text)
    var i = 0
    def err(msg: String, at: Int): Nothing = {
      val where = if (at < toks.length) s"'${toks(at).text}' at line ${toks(at).line}"
        else "end of input"
      throw new IllegalArgumentException(s"esf parse error: $msg, got $where")
    }
    def expect(t: String): Unit =
      if (i < toks.length && toks(i).text == t) i += 1
      else err(s"expected '$t'", i)
    val events = mutable.LinkedHashMap[String, Vector[EsfAttr]]()
    while (i < toks.length) {
      val evName = toks(i).text
      if (!evName.headOption.exists(c => c.isLetter || c == '_'))
        err("expected an event name", i)
      i += 1
      expect("{")
      val attrs = Vector.newBuilder[EsfAttr]
      while (i < toks.length && toks(i).text != "}") {
        var required = false
        var nullable = false
        while (i < toks.length && Qualifiers(toks(i).text)) {
          toks(i).text match {
            case "required" => required = true
            case "nullable" => nullable = true
            case _ => // "optional" is the default
          }
          i += 1
        }
        // line of the TYPE token = the declaration's own line (the
        // terminating ';' can sit lines later under a spaced default)
        val declLine = if (i < toks.length) toks(i).line else 0
        val typeName = if (i < toks.length) toks(i).text else err("expected a type", i)
        val scalarTok = TypeTokens.getOrElse(typeName.toLowerCase,
          err(s"unknown esf type '$typeName' (expected one of " +
            s"${TypeTokens.keys.toSeq.sorted.mkString(", ")})", i))
        i += 1
        val attrName = if (i < toks.length) toks(i).text else err("expected an attribute name", i)
        if (!attrName.headOption.exists(c => c.isLetter || c == '_'))
          err("expected an attribute name", i)
        i += 1
        var arrayLen: Option[Int] = None
        if (i < toks.length && toks(i).text == "[") {
          i += 1
          val lenTok = if (i < toks.length) toks(i).text else err("expected an array length", i)
          arrayLen = Some(lenTok.toIntOption
            .filter(n => n >= 1 && n <= 65535)
            .getOrElse(err("expected an array length in [1, 65535]", i)))
          i += 1
          expect("]")
        }
        var default: Option[String] = None
        if (i < toks.length && toks(i).text == "=") {
          i += 1
          // the literal may span tokens so a spaced array literal
          // (`= 1, 2, 3;`) reads naturally — but ONLY comma-linked
          // continuations are consumed: after `string s = "x"` a
          // missing semicolon must fail the expect(";") below as a
          // named parse error, never swallow the next declaration
          // (or a sibling event block) into the literal
          val sb = new StringBuilder
          while (i < toks.length && toks(i).text != ";" &&
              toks(i).text != "{" && toks(i).text != "}" &&
              (sb.isEmpty || sb.last == ',' || toks(i).text.startsWith(","))) {
            sb ++= toks(i).text; i += 1
          }
          if (sb.isEmpty) err("expected a default value", i)
          default = Some(sb.toString)
        }
        expect(";")
        // `nullable` is an ARRAY qualifier (it selects the N_*_ARRAY
        // wire tokens, which have no scalar counterpart — an unset
        // scalar attribute is simply absent); on a scalar declaration
        // it would silently do nothing, so it fails the load, named
        if (nullable && arrayLen.isEmpty)
          throw new IllegalArgumentException(
            s"esf parse error: qualifier 'nullable' on scalar attribute " +
              s"'$attrName' at line $declLine (nullable applies to array " +
              "declarations only; an optional scalar is just left unset)")
        val token =
          if (arrayLen.isEmpty) scalarTok
          else if (nullable) LwesType.nullableOf((scalarTok | LwesType.ArrayBit).toByte)
          else (scalarTok | LwesType.ArrayBit).toByte
        val attr = EsfAttr(attrName, typeName.toLowerCase, token,
          required, nullable, arrayLen, default)
        // malformed default fails HERE, at load time — named with the
        // declaration's line like every other parse error
        try typedDefault(attr)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"esf parse error: ${Option(e.getMessage).getOrElse(e.toString)
                .stripPrefix("esf: ")} " +
                s"at line $declLine", e) // cause kept for the deep frames
        }
        attrs += attr
      }
      expect("}")
      val built = attrs.result()
      // a repeated event block extends the earlier one (lwes-java
      // re-registration semantics: last declaration of an attr wins)
      val prev = events.getOrElse(evName, Vector.empty)
      val replaced = built.map(_.name).toSet
      events(evName) = prev.filterNot(a => replaced(a.name)) ++ built
    }
    EsfTemplateDb(ListMap.from(events))
  }

  /** Typed default of an attribute declaration, as the [[LwesAttr]] a
    * wire-present value of the declared type would parse to — so
    * default materialization rides the exact conversion path real
    * values take (lwes-java EventTemplateDB semantics: a declared
    * default applies to UNSET attributes; the read path materializes
    * it in place of NULL, the write path encodes it for unset
    * columns). Array defaults are comma-separated inside one literal
    * (`int32 dims[4] = 1,2,3;` / `string tags[4] = "a,b";`).
    * A malformed literal is a TEMPLATE error, named with the
    * attribute, raised at parse/load time — not on the first row. */
  def typedDefault(a: EsfAttr): Option[LwesAttr] = a.default.map { raw =>
    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"esf: malformed default for ${a.typeName}" +
        s"${if (a.arrayLen.isDefined) "[]" else ""} attribute " +
        s"'${a.name}': '$raw' ($why)")
    def unquote(s: String): String =
      if (s.length >= 2 && s.head == '"' && s.last == '"')
        s.substring(1, s.length - 1) else s
    def longIn(s: String, lo: Long, hi: Long): Long = {
      val v = s.toLongOption.getOrElse(bad(s"'$s' is not an integer"))
      if (v < lo || v > hi) bad(s"$v is out of range [$lo, $hi]")
      v
    }
    def scalar(token: Byte, s: String): Any = token match {
      case LwesType.UInt16 => longIn(s, 0L, 0xffffL).toInt
      case LwesType.Int16 => longIn(s, Short.MinValue, Short.MaxValue).toShort
      case LwesType.UInt32 => longIn(s, 0L, 0xffffffffL)
      case LwesType.Int32 => longIn(s, Int.MinValue, Int.MaxValue).toInt
      case LwesType.Int64 => longIn(s, Long.MinValue, Long.MaxValue)
      case LwesType.UInt64 =>
        // unsigned literal, raw-bits value; a negative literal is the
        // raw-bits representation too (`uint64 mask = -1;` = 2^64-1 —
        // the same any-long-is-valid-bits contract the write path has)
        try java.lang.Long.parseUnsignedLong(s)
        catch { case _: NumberFormatException =>
          s.toLongOption.getOrElse(bad(s"'$s' is not an unsigned integer")) }
      case LwesType.Bool => s.toLowerCase match {
        case "true" => true
        case "false" => false
        case _ => bad(s"'$s' is not true/false")
      }
      case LwesType.ByteT => longIn(s, Byte.MinValue, Byte.MaxValue).toByte
      case LwesType.Float =>
        s.toFloatOption.getOrElse(bad(s"'$s' is not a float"))
      case LwesType.Double =>
        s.toDoubleOption.getOrElse(bad(s"'$s' is not a double"))
      case LwesType.Str => unquote(s)
      case LwesType.IpAddr =>
        try LwesEvent.parseIp(unquote(s))
        catch { case _: IllegalArgumentException | _: NumberFormatException =>
          bad(s"'$s' is not a dotted-quad IPv4 address") }
      case t => bad(s"type token 0x${"%02x".format(t)} takes no default")
    }
    // split an array literal on TOP-LEVEL commas only: `"a","b"` is two
    // elements, `"a,b"` is ONE string containing a comma
    def splitTop(s: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inQuote = false
      s.foreach { c =>
        if (c == '"') { inQuote = !inQuote; sb += c }
        else if (c == ',' && !inQuote) { out += sb.toString; sb.clear() }
        else sb += c
      }
      out += sb.toString
      out.toArray
    }
    val value: Any =
      if (LwesType.isNullableArray(a.token)) {
        // nullable-array default: elements parse like the classic array
        // literal, plus a bare `null` element marks a hole
        // (`nullable int32 dims[4] = 1, null, 3;`)
        val et = LwesType.elementOfNullable(a.token)
        val parts = splitTop(raw)
        a.arrayLen.filter(_ < parts.length).foreach(cap =>
          bad(s"${parts.length} elements over the declared max $cap"))
        parts.map[AnyRef](p =>
          if (p.trim.equalsIgnoreCase("null")) null
          else scalar(et, p).asInstanceOf[AnyRef])
      }
      else if (!LwesType.isArray(a.token)) scalar(a.token, raw)
      else {
        val et = LwesType.elementOf(a.token)
        val parts = splitTop(raw)
        a.arrayLen.filter(_ < parts.length).foreach(cap =>
          bad(s"${parts.length} elements over the declared max $cap"))
        et match {
          case LwesType.UInt16 => parts.map(scalar(et, _).asInstanceOf[Int])
          case LwesType.Int16 => parts.map(scalar(et, _).asInstanceOf[Short])
          case LwesType.UInt32 => parts.map(scalar(et, _).asInstanceOf[Long])
          case LwesType.Int32 => parts.map(scalar(et, _).asInstanceOf[Int])
          case LwesType.Int64 | LwesType.UInt64 =>
            parts.map(scalar(et, _).asInstanceOf[Long])
          case LwesType.Bool => parts.map(scalar(et, _).asInstanceOf[Boolean])
          case LwesType.ByteT => parts.map(scalar(et, _).asInstanceOf[Byte])
          case LwesType.Float => parts.map(scalar(et, _).asInstanceOf[Float])
          case LwesType.Double => parts.map(scalar(et, _).asInstanceOf[Double])
          case LwesType.Str => parts.map(unquote)
          case LwesType.IpAddr =>
            parts.map(scalar(et, _).asInstanceOf[Array[Byte]])
          case t => bad(s"array of token 0x${"%02x".format(t)} takes no default")
        }
      }
    LwesAttr(a.name, a.token, value)
  }

  // (path, mtime, length) -> parsed db: schema inference and the scan
  // builder both load the template per query — on a remote store the
  // second fetch is a wasted round-trip, so identical file states hit
  // the memo. Bounded: templates are few; cleared if it ever balloons.
  private val loadCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), EsfTemplateDb]()

  /** Parse a template from a (possibly remote) file. REMOTE stores are
    * memoized on (path, modification time, length) — inference and the
    * scan builder both load per query, and the second fetch is a
    * wasted round-trip. Local files always re-read: the load is cheap
    * and an interactive edit-test loop must never see a stale parse
    * through a same-length same-mtime-tick edit. */
  def load(path: String, conf: org.apache.hadoop.conf.Configuration): EsfTemplateDb = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    def read(): EsfTemplateDb = {
      val in = fs.open(p)
      try parse(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
    if (fs.getScheme == "file") read()
    else {
      val st = fs.getFileStatus(p)
      if (loadCache.size > 64) loadCache.clear()
      loadCache.computeIfAbsent((path, st.getModificationTime, st.getLen),
        _ => read())
    }
  }
}
