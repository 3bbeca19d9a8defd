package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Delta-style automatic partition filters for DERIVED partition
  * columns: a table partitioned by `day = CAST(ts AS DATE)` should
  * prune directories when the user filters only on `ts` — without the
  * user ever mentioning `day`.
  *
  * WHY this is an optimizer rule and not a read helper: the whole point
  * is that ARBITRARY queries over the table get the pruning. Delta
  * implements exactly this for generated partition columns
  * (OptimizeGeneratedColumn): from a predicate on the generation
  * SOURCE column it derives the implied predicate on the partition
  * column, which Spark's normal planning then turns into
  * `PartitionFilters` — directory-level pruning at planning time, zero
  * IO for excluded partitions. At 100 TB this converts "scan every
  * date dir because the user wrote `ts >= X` instead of `day >= X`"
  * into the pruned scan they meant.
  *
  * Supported derivation: `partCol = CAST(srcCol AS DATE)` — monotone
  * non-decreasing, so range predicates map soundly:
  *   ts >= L  and  ts > L   →  day >= date(L)
  *   ts <= U  and  ts < U   →  day <= date(U)
  *   ts = V                 →  day = date(V)
  * (strict bounds widen to non-strict on the date — a SUPERSET of the
  * needed partitions, never fewer: the rule only ever ANDs an implied
  * predicate onto the original condition, so semantics are preserved
  * by construction and no opt-in conf is needed. Registration of the
  * derivation is the opt-in.)
  *
  * Guards: fires only on relations whose root path carries a
  * registered derivation, only for literal comparison bounds (constant
  * folding has already run), and only when the condition does not
  * already reference the partition column — which also makes the rule
  * a fixpoint (after one application the condition references it).
  */
object GeneratedPartitionRule extends Rule[LogicalPlan] with PredicateHelper {

  /** rootPath → (partitionCol, sourceCol); keyed by the FULL normalized
    * URI (scheme + authority + path), not path alone — `s3://bucketA/tbl`
    * and `hdfs://nn/tbl` must not collide, because a wrong match ANDs an
    * implied row-level predicate onto a table where the derivation may
    * not hold. Unqualified local paths default to the `file` scheme so
    * `/tmp/x` and Spark's qualified `file:/tmp/x` still meet. */
  private val derivations =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private def norm(dir: String): String =
    qualify(new org.apache.hadoop.fs.Path(dir))

  /** Qualify through the session's Hadoop conf when possible — an
    * unqualified path then resolves against fs.defaultFS (with the
    * default port filled in), so `register("/data/t")` and the
    * relation's qualified `hdfs://nn:8020/data/t` root meet. Falls back
    * to a string normalization (scheme defaulted to `file`) when no
    * active session/filesystem is reachable. */
  private def qualify(p: org.apache.hadoop.fs.Path): String =
    try {
      val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
      p.getFileSystem(conf).makeQualified(p).toUri.toString
    } catch {
      case _: Throwable =>
        val uri = p.toUri
        val scheme = Option(uri.getScheme).getOrElse("file")
        val auth = Option(uri.getAuthority).getOrElse("")
        s"$scheme://$auth${uri.getPath}"
    }

  /** Declare `partCol = CAST(srcCol AS DATE)` for the table at `dir`. */
  def register(dir: String, partCol: String, srcCol: String): Unit =
    derivations.put(norm(dir), (partCol, srcCol))

  def unregister(dir: String): Unit = derivations.remove(norm(dir))

  private def derivationFor(hfs: HadoopFsRelation): Option[(String, String)] =
    hfs.location.rootPaths.headOption
      .flatMap(p => derivations.get(qualify(p)))

  private def toDate(lit: Literal): Option[Literal] = lit match {
    case Literal(v, TimestampType) if v != null =>
      val days = Cast(lit, DateType, Some(conf.sessionLocalTimeZone)).eval(null)
      Option(days).map(Literal(_, DateType))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, l: LogicalRelation) =>
      val rewritten = for {
        hfs <- Some(l.relation).collect { case h: HadoopFsRelation => h }
        (partName, srcName) <- derivationFor(hfs)
        partAttr <- l.output.find(a => conf.resolver(a.name, partName))
        srcAttr <- l.output.find(a => conf.resolver(a.name, srcName))
        if !cond.references.contains(partAttr)
        derived = splitConjunctivePredicates(cond).flatMap {
          case GreaterThanOrEqual(a: Attribute, v: Literal) if a.semanticEquals(srcAttr) =>
            toDate(v).map(GreaterThanOrEqual(partAttr, _))
          case GreaterThan(a: Attribute, v: Literal) if a.semanticEquals(srcAttr) =>
            toDate(v).map(GreaterThanOrEqual(partAttr, _))
          case LessThanOrEqual(a: Attribute, v: Literal) if a.semanticEquals(srcAttr) =>
            toDate(v).map(LessThanOrEqual(partAttr, _))
          case LessThan(a: Attribute, v: Literal) if a.semanticEquals(srcAttr) =>
            toDate(v).map(LessThanOrEqual(partAttr, _))
          case EqualTo(a: Attribute, v: Literal) if a.semanticEquals(srcAttr) =>
            toDate(v).map(EqualTo(partAttr, _))
          // literal-on-the-left spellings
          case GreaterThanOrEqual(v: Literal, a: Attribute) if a.semanticEquals(srcAttr) =>
            toDate(v).map(LessThanOrEqual(partAttr, _))
          case GreaterThan(v: Literal, a: Attribute) if a.semanticEquals(srcAttr) =>
            toDate(v).map(LessThanOrEqual(partAttr, _))
          case LessThanOrEqual(v: Literal, a: Attribute) if a.semanticEquals(srcAttr) =>
            toDate(v).map(GreaterThanOrEqual(partAttr, _))
          case LessThan(v: Literal, a: Attribute) if a.semanticEquals(srcAttr) =>
            toDate(v).map(GreaterThanOrEqual(partAttr, _))
          case EqualTo(v: Literal, a: Attribute) if a.semanticEquals(srcAttr) =>
            toDate(v).map(EqualTo(partAttr, _))
          case _ => None
        }
        if derived.nonEmpty
      } yield Filter(And(derived.reduce(And), cond), l)
      rewritten.getOrElse(f)
  }
}
