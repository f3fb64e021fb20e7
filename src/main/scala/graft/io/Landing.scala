package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.{Instant, ZoneOffset}

/** Upload / landing zone — the reference's A1/A2 surface
  * (data_pipes/__init__.py:209-275, pipeline.py:487-497) re-expressed
  * as a thin driver-side ingest helper: validate an incoming file
  * against the model's admission rules, then place it under the dated
  * landing layout `<root>/<dir>/YYYY/MM/DD/<hash8>_<safeName>` where
  * the distributed readers (and the pipeline's extract stage) pick it
  * up. Control plane only — no row data touches the driver.
  */
final case class LandingConfig(
    /** Accepted extensions (reference `upload_accept`). */
    acceptExtensions: Set[String] = Set("jsonl", "json", "csv", "gz", "parquet"),
    /** Admission toggle (reference `upload_active`). */
    active: Boolean = true)

final class UploadRejectedException(msg: String) extends RuntimeException(msg)

object Landing {

  /** `secure_filename` analog: strip path components + risky chars. */
  def safeName(name: String): String =
    Paths.get(name).getFileName.toString.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Admission check (reference __init__.py:245-265): extension ∈
    * accepted set and uploads active. Throws UploadRejectedException
    * (maps to the reference's 400/415 responses). */
  def admit(fileName: String, cfg: LandingConfig): Unit = {
    if (!cfg.active)
      throw new UploadRejectedException("uploads are not active for this model")
    val ext = fileName.split('.').drop(1).lastOption.getOrElse("")
    val ext2 = fileName.split('.').drop(1).takeRight(2).headOption.getOrElse(ext)
    if (!cfg.acceptExtensions.contains(ext) && !cfg.acceptExtensions.contains(ext2))
      throw new UploadRejectedException(
        s"extension '$ext' not in accepted set ${cfg.acceptExtensions.mkString("{", ",", "}")}")
  }

  /** Land a file: admit, then copy to
    * `<root>/<dirName>/YYYY/MM/DD/<sha224-8>_<safeName>` (reference
    * filename scheme __init__.py:255-258 + dated layout
    * pipeline.py:487-497). Returns the landed path. */
  def land(src: Path, root: String, dirName: String, cfg: LandingConfig = LandingConfig(),
      now: Instant = Instant.now()): Path = {
    val name = safeName(src.getFileName.toString)
    admit(name, cfg)
    val d = now.atZone(ZoneOffset.UTC)
    val md = java.security.MessageDigest.getInstance("SHA-224")
    val hash8 = md.digest(s"${now.toEpochMilli}$name".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val destDir = Paths.get(root, dirName,
      f"${d.getYear}%04d", f"${d.getMonthValue}%02d", f"${d.getDayOfMonth}%02d")
    Files.createDirectories(destDir)
    val dest = destDir.resolve(s"${hash8}_$name")
    Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
    dest
  }
}
