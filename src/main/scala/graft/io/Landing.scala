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
    active: Boolean = true,
    /** Minimum uploader role (reference `upload_role` + ext/roles.py
      * `require_role`: readonly=1 < superuser=2 < admin=3). 0 disables
      * the gate. */
    requiredRole: Int = 0)

final class UploadRejectedException(msg: String) extends RuntimeException(msg)

object Landing {

  /** `secure_filename` analog: strip path components + risky chars. */
  def safeName(name: String): String =
    Paths.get(name).getFileName.toString.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Admission check (reference __init__.py:245-265): extension ∈
    * accepted set, uploads active, and uploader role sufficient.
    * Throws UploadRejectedException (maps to the reference's
    * 400/403/415 responses). `uploaderRole = None` mirrors the
    * reference's roles-not-implemented arm (roles.py:20-22): warn-and-
    * allow, because a deployment without user roles must not lose
    * uploads. */
  def admit(fileName: String, cfg: LandingConfig,
      uploaderRole: Option[Int] = None): Unit = {
    if (!cfg.active)
      throw new UploadRejectedException("uploads are not active for this model")
    if (cfg.requiredRole > 0) uploaderRole match {
      case Some(r) if r < cfg.requiredRole =>
        throw new UploadRejectedException(
          s"role $r below required ${cfg.requiredRole} (403)")
      case None =>
        System.err.println("[landing] roles not implemented on uploader; " +
          "permissions not evaluated (roles.py:20-22 warn arm)")
      case _ => ()
    }
    // reference parity (__init__.py:245): ONLY the lowercased LAST
    // extension token gates admission — `x.jsonl.gz` is admitted via
    // "gz" in the accepted set, exactly as the reference's
    // upload_accept does, and `evil.jsonl.exe` is REJECTED (an
    // earlier draft also accepted the second-to-last token, which
    // let a forbidden final extension ride in behind an accepted one)
    val ext = fileName.split('.').drop(1).lastOption.getOrElse("")
      .toLowerCase
    // normalize the configured set too: the token above is lowercased,
    // so a caller passing Set("CSV") would otherwise silently reject
    // every file — compare lowercase-to-lowercase
    if (!cfg.acceptExtensions.map(_.toLowerCase).contains(ext))
      throw new UploadRejectedException(
        s"extension '$ext' not in accepted set ${cfg.acceptExtensions.mkString("{", ",", "}")}")
  }

  /** Land a file: admit, then copy to
    * `<root>/<dirName>/YYYY/MM/DD/<sha224-8>_<safeName>` (reference
    * filename scheme __init__.py:255-258 + dated layout
    * pipeline.py:487-497). Returns the landed path. */
  def land(src: Path, root: String, dirName: String, cfg: LandingConfig = LandingConfig(),
      now: Instant = Instant.now(), uploaderRole: Option[Int] = None): Path = {
    val name = safeName(src.getFileName.toString)
    admit(name, cfg, uploaderRole)
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
