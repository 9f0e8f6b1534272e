package org.apache.spark.sql.execution.datasources.parquet

import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.schema.{GroupType, MessageType, Type}

import org.apache.spark.sql.catalyst.expressions.variant.ObjectExtraction
import org.apache.spark.sql.execution.datasources.VariantMetadata
import org.apache.spark.sql.types.{DataType, StructType}

/** [[ParquetReadSupport]] with the SHREDDED-VARIANT clip Spark 4.1.2
  * stubs out: upstream `clipVariantSchema` returns the parquet group
  * UNCHANGED (a literal `aload_1; areturn` in the shipped bytecode),
  * so a pushed `variant_get` still reads every shredded `typed_value`
  * child of the variant group — the extraction saves per-row
  * VariantVal materialization but none of the file IO. This subclass
  * post-processes the requested schema `init` produced: for every
  * requested field whose catalyst type is a variant-struct (the
  * `VariantMetadata`-tagged replacement Catalyst builds for accepted
  * extraction pushdown), the object-shredded `typed_value` children
  * are intersected with the keys the requested paths actually touch.
  *
  * Correctness rests on the variant shredding spec's fallback rule:
  * `metadata` and `value` are ALWAYS kept, and a row whose field was
  * not shredded (or whose shredded child we dropped) reads out of the
  * `value` binary exactly as an unshredded row would — dropping a
  * typed_value child only loses the typed fast path for paths that
  * never read it. Conservative bail-outs (group kept whole): a
  * requested full-variant path (`$`), a leading array step (the
  * typed_value may be array-shredded), a non-group `typed_value`
  * (scalar shredding), or any shape the walk does not recognize.
  */
class GraftVariantReadSupport extends ParquetReadSupport {
  override def init(context: InitContext): ReadSupport.ReadContext = {
    val base = super.init(context)
    // cheap pregate before re-parsing the schema JSON super.init
    // already parsed once: the vast majority of scans carry no
    // variant-struct, and the metadata KEY can only appear in the
    // serialized form when one does (review-found r16)
    val raw = context.getConfiguration
      .get(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA)
    if (raw == null || !raw.contains(VariantMetadata.METADATA_KEY))
      return base
    val catalyst = Option(raw).map(s => StructType.fromString(s))
    if (sys.props.contains("graft.variant.clip.debug"))
      System.err.println(s"[clip-debug] catalyst=$catalyst " +
        s"hasVS=${catalyst.exists(GraftVariantReadSupport.hasVariantStruct)} " +
        s"requested=${base.getRequestedSchema}")
    catalyst match {
      case Some(st) if GraftVariantReadSupport.hasVariantStruct(st) =>
        // honor the scan's name-resolution mode: the reader conf sets
        // CASE_SENSITIVE (false by default), and an externally-added
        // file whose physical column case differs from the catalyst
        // name must still pair up — a case-mismatched miss is silent
        // (correct rows via the binary fallback, pruning benefit lost)
        val caseSensitive = context.getConfiguration.getBoolean(
          org.apache.spark.sql.internal.SQLConf.CASE_SENSITIVE.key, false)
        new ReadSupport.ReadContext(
          GraftVariantReadSupport.clip(base.getRequestedSchema, st,
            caseSensitive),
          base.getReadSupportMetadata)
      case _ => base
    }
  }
}

object GraftVariantReadSupport {
  /** Shredded typed_value children DROPPED by the clip since JVM
    * start — test observability that the clip actually engages.
    */
  val clippedChildren = new java.util.concurrent.atomic.AtomicLong

  private[parquet] def hasVariantStruct(st: StructType): Boolean =
    st.fields.exists(f => isVariantStruct(f.dataType) || (f.dataType match {
      case s: StructType => hasVariantStruct(s)
      case _ => false
    }))

  private def isVariantStruct(dt: DataType): Boolean = dt match {
    case s: StructType => VariantMetadata.isVariantStruct(s)
    case _ => false
  }

  private[parquet] def clip(requested: MessageType,
      catalyst: StructType, caseSensitive: Boolean = true): MessageType = {
    val fields = clipFields(requested.getFields.asScala.toSeq, catalyst,
      caseSensitive)
    new MessageType(requested.getName, fields.asJava)
  }

  private def clipFields(fields: Seq[Type],
      catalyst: StructType, caseSensitive: Boolean): Seq[Type] =
    fields.map { f =>
      // exact match first; under a case-insensitive scan, fall back to
      // the resolver's semantics so a physical-case-drifted file still
      // pairs (ADVICE r16 — the miss was silent: correct results via
      // the fallback, pruning benefit lost)
      val matched = catalyst.fields.find(_.name == f.getName).orElse(
        if (caseSensitive) None
        else catalyst.fields.find(_.name.equalsIgnoreCase(f.getName)))
      matched match {
        case Some(cf) if isVariantStruct(cf.dataType) && !f.isPrimitive =>
          clipVariantGroup(f.asGroupType(),
            cf.dataType.asInstanceOf[StructType])
        case Some(cf) => (cf.dataType, f) match {
          case (st: StructType, g) if !g.isPrimitive &&
              hasVariantStruct(st) =>
            val gt = g.asGroupType()
            gt.withNewFields(
              clipFields(gt.getFields.asScala.toSeq, st, caseSensitive)
                .asJava)
          case _ => f
        }
        case None => f
      }
    }

  private def clipVariantGroup(g: GroupType,
      variantStruct: StructType): Type = {
    // keys the requested paths touch at the top of the variant object;
    // None = a path needs the whole value (full variant, leading array
    // step, unparseable) — no clip
    val needed = variantStruct.fields.foldLeft(
        Option(Set.empty[String])) { (acc, f) =>
      acc.flatMap { keys =>
        val segs = VariantMetadata.fromMetadata(f.metadata).parsedPath()
        segs.headOption match {
          case Some(ObjectExtraction(key)) => Some(keys + key)
          case _ => None // "$" or array step: keep everything
        }
      }
    }
    needed match {
      case Some(keys) if g.containsField("typed_value") =>
        val tv = g.getType("typed_value")
        if (tv.isPrimitive) g // scalar shredding: nothing to clip
        else {
          val tvg = tv.asGroupType()
          val kept = tvg.getFields.asScala.filter(c => keys(c.getName))
          clippedChildren.addAndGet(tvg.getFieldCount - kept.size)
          if (kept.isEmpty)
            // no requested path has a shredded child: metadata+value
            // alone serve every extraction via the binary fallback
            g.withNewFields(g.getFields.asScala
              .filterNot(_.getName == "typed_value").asJava)
          else g.withNewFields(g.getFields.asScala.map {
            case t if t.getName == "typed_value" =>
              tvg.withNewFields(kept.asJava)
            case t => t
          }.asJava)
        }
      case _ => g
    }
  }
}
