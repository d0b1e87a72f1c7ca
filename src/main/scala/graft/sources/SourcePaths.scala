package graft.sources

import java.nio.file.{Files, FileSystems, Paths}
import scala.jdk.CollectionConverters._

/** Path-spec resolution shared by the raster DSv2 sources (GeoTIFF,
  * NetCDF, GRIB2): a production sweep reads a DIRECTORY of product
  * files (one GOES-R file per observation slot, one GRIB per forecast
  * run), not a single path — the file is the natural top-level
  * parallel unit at 100 TB, multiplied by each source's per-file
  * partitioning (strips/tiles, variables, messages).
  *
  * Accepted `path` forms, comma-separable:
  * - a file: read as-is;
  * - a directory: every regular file directly inside, sorted by name
  *   (deterministic partition order);
  * - a glob (`*`/`?`/`[]` in the last segment): matched against the
  *   parent directory's entries, sorted.
  */
object SourcePaths {
  def resolve(spec: String): Seq[String] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { one =>
      val p = Paths.get(one)
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.toString).toSeq.sorted
        finally s.close()
      } else if (one.exists("*?[".contains(_))) {
        val parent = Option(p.getParent).getOrElse(Paths.get("."))
        val matcher = FileSystems.getDefault
          .getPathMatcher("glob:" + p.getFileName.toString)
        if (!Files.isDirectory(parent)) Seq.empty
        else {
          val s = Files.list(parent)
          try s.iterator().asScala
            .filter(f => Files.isRegularFile(f) && matcher.matches(f.getFileName))
            .map(_.toString).toSeq.sorted
          finally s.close()
        }
      } else Seq(one)
    }

  def baseName(path: String): String =
    Paths.get(path).getFileName.toString
}
