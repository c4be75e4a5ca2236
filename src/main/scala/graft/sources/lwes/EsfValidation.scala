package graft.sources.lwes

import graft.lwes.{EsfTemplateDb, LwesEvent}
import org.apache.spark.sql.types.StructType

/** Named failure for ESF write-side validation — a template violation
  * should read as one, not as a generic cast error three stages later. */
class EsfValidationException(msg: String)
    extends IllegalArgumentException(msg)

/** Write-side ESF template validation (`.option("esf", path)` +
  * `df.write.format("lwes")`): the Spark counterpart of lwes-java
  * `EventTemplateDB.validate` — undeclared events/attributes and
  * incompatible column types are rejected up front, required
  * attributes must be present and non-null, and values are encoded
  * with the template's declared wire types.
  */
object EsfValidation {

  /** Header attributes the journal layer injects itself — a template
    * may declare them required (MetaEventInfo conventionally does)
    * without the DataFrame having to carry the column. */
  private def HeaderAttrs = LwesEvent.HeaderAttrs

  /** Field token meaning "not declared for this event" — a STRICT
    * validation throws for it up front; a LENIENT one (multi-event
    * `eventNameColumn` writes, where the DataFrame schema is the UNION
    * of every event's columns and NULL means "attribute unset") defers
    * to write time, where only a NON-null value under the sentinel is
    * a violation. */
  val Undeclared: Byte = 0

  /** One event's validated write plan: per-field template token,
    * required flag, declared max array length (-1 = scalar), typed
    * default (null = none), plus `extraDefaults` — declared attributes
    * carrying a default but having NO column in the DataFrame, encoded
    * for every written row (lwes-java EventTemplateDB default
    * semantics: an unset attribute with a declared default gets it). */
  final case class EsfWritePlan(tokens: Array[Byte], required: Array[Boolean],
      maxLen: Array[Int], defaults: Array[graft.lwes.LwesAttr],
      extraDefaults: Seq[graft.lwes.LwesAttr])

  /** Validate `schema` against the template for one event name and
    * return its [[EsfWritePlan]]; `skip(i)` marks partition/event-name
    * columns that never become attributes.
    * Throws [[EsfValidationException]] with the exact violation. */
  def tokensFor(db: EsfTemplateDb, event: String, schema: StructType,
      attrs: Array[String], skip: Array[Boolean],
      strict: Boolean = true): EsfWritePlan = {
    val m = db.attrMapFor(event).getOrElse(
      throw new EsfValidationException(
        s"esf validation: event '$event' is not declared in the template " +
          s"(declared events: ${db.eventNames.mkString(", ")})"))
    val toks = new Array[Byte](schema.length)
    val req = new Array[Boolean](schema.length)
    val maxLen = Array.fill(schema.length)(-1)
    val dfl = new Array[graft.lwes.LwesAttr](schema.length)
    var i = 0
    while (i < schema.length) {
      if (!skip(i)) {
        val attr = attrs(i)
        m.get(attr) match {
          case None =>
            if (strict) throw new EsfValidationException(
              s"esf validation: attribute '$attr' (column '${schema(i).name}') " +
                s"is not declared for event '$event' " +
                s"(declared attributes: ${m.keys.toSeq.sorted.mkString(", ")})")
            toks(i) = Undeclared
          case Some(a) =>
            if (!LwesOptions.esfWriteCompatible(schema(i).dataType, a.token))
              throw new EsfValidationException(
                s"esf validation: column '${schema(i).name}' of Spark type " +
                  s"${schema(i).dataType.simpleString} cannot be written as " +
                  s"declared esf type '${a.typeName}" +
                  s"${if (a.arrayLen.isDefined) "[]" else ""}' " +
                  s"(attribute '$attr' of event '$event')")
            toks(i) = a.token
            req(i) = a.required
            maxLen(i) = a.arrayLen.getOrElse(-1)
            dfl(i) = graft.lwes.Esf.typedDefault(a).orNull
        }
      }
      i += 1
    }
    // every required template attribute needs a column (header attrs
    // are stamped by the journal layer itself; a declared default
    // satisfies the requirement — the default is what gets written)
    val written = schema.indices.filterNot(skip).map(attrs(_)).toSet
    m.values.foreach { a =>
      if (a.required && !written.contains(a.name) && !HeaderAttrs(a.name) &&
          a.default.isEmpty)
        throw new EsfValidationException(
          s"esf validation: required attribute '${a.name}' of event " +
            s"'$event' has no column in the written DataFrame")
    }
    // declared defaults with no column: encoded for every row, in
    // declaration order (header attrs stay the journal layer's)
    val extras = db.attrsFor(event).get
      .filter(a => a.default.isDefined && !written.contains(a.name) &&
        !HeaderAttrs(a.name))
      .flatMap(graft.lwes.Esf.typedDefault)
    EsfWritePlan(toks, req, maxLen, dfl, extras)
  }
}
