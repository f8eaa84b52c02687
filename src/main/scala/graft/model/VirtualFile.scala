package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** How a multi-layer read merges its physical layers.
  *
  * Reference semantics: porcupine-core/src/System/TaskPipeline/
  * PorcupineTree.hs:614-636 and VirtualFile.hs:75-81.
  */
sealed trait ReadScheme
object ReadScheme {
  /** Exactly one layer expected; if several bound, the LAST wins (with a
    * warning) — PorcupineTree.hs:632-636. */
  case object SingleLayer extends ReadScheme
  /** >=1 layer; layers folded left-to-right with the merge strategy;
    * embedded default (if any) is the base. */
  case object Layered extends ReadScheme
  /** 0 layers allowed -> merge identity (empty DataFrame / default). */
  case object LayeredWithNull extends ReadScheme
}

/** Semigroup used to fold read layers (PorcupineTree.hs:626-636). For
  * row-sets the monoid is union; config-like objects may need a custom
  * reduce (e.g. keyed last-write-wins).
  */
sealed trait MergeStrategy {
  def apply(a: DataFrame, b: DataFrame): DataFrame
}
object MergeStrategy {
  /** Row-set monoid: `unionByName` (schema-tolerant). */
  case object UnionByName extends MergeStrategy {
    def apply(a: DataFrame, b: DataFrame): DataFrame =
      a.unionByName(b, allowMissingColumns = true)
  }
  /** Keyed right-biased override: rows in `b` replace same-key rows in
    * `a` (the reference's "layers override one another" semantics for
    * keyed data, docs/index.md:636-653). Implemented as anti-join +
    * union so it stays a Catalyst plan (no driver merge). */
  final case class KeyedOverride(keys: Seq[String]) extends MergeStrategy {
    def apply(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b.select(keys.map(org.apache.spark.sql.functions.col): _*),
             keys, "left_anti")
        .unionByName(b, allowMissingColumns = true)
  }
  /** Arbitrary user reduce (driver-composed, still lazy). */
  final case class Custom(f: (DataFrame, DataFrame) => DataFrame)
      extends MergeStrategy {
    def apply(a: DataFrame, b: DataFrame): DataFrame = f(a, b)
  }
}

/** Whether an entry is read, written, or both (reference `DataSource` /
  * `DataSink` / `BidirVirtualFile`, VirtualFile.hs:280-286). */
sealed trait Usage
object Usage {
  case object Source extends Usage
  case object Sink extends Usage
  case object Bidir extends Usage
}

/** A named logical dataset endpoint — the catalog entry.
  *
  * Spark-native re-expression of the reference's `VirtualFile a b`
  * (porcupine-core/src/Data/Locations/VirtualFile.hs:98-107): virtual
  * path + serial formats + layered-read scheme + embedded default +
  * documentation. The value domain is `DataFrame`; type safety is
  * recovered at the edges via `.as[T]` with the optional declared
  * schema checked on read.
  *
  * @param formats supported format extensions; head is the default used
  *                when a bound location has no extension
  *                (PorcupineTree.hs:512-529).
  */
final case class VirtualFile(
    path: VPath,
    formats: Seq[String] = Seq("parquet"),
    usage: Usage = Usage.Bidir,
    schema: Option[StructType] = None,
    readScheme: ReadScheme = ReadScheme.SingleLayer,
    merge: MergeStrategy = MergeStrategy.UnionByName,
    embeddedDefault: Option[SparkSession => DataFrame] = None,
    doc: String = ""
) {
  def defaultExt: String = formats.head
  /** Conflicting re-declaration check — two declarations of the same
    * virtual path must agree on schema and formats (reference hard
    * error at tree-merge time, PorcupineTree.hs:108-114). */
  def mergeWith(other: VirtualFile): VirtualFile = {
    require(path == other.path, s"cannot merge $path with ${other.path}")
    (schema, other.schema) match {
      case (Some(a), Some(b)) if a != b =>
        throw new IllegalArgumentException(
          s"virtual path $path declared twice with conflicting schemas:\n  $a\n  $b")
      case _ => ()
    }
    val usage2 = (usage, other.usage) match {
      case (a, b) if a == b => a
      case _                => Usage.Bidir
    }
    copy(
      formats = (formats ++ other.formats).distinct,
      usage = usage2,
      schema = schema.orElse(other.schema),
      doc = if (doc.nonEmpty) doc else other.doc)
  }
}
