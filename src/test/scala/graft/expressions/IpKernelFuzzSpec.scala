package graft.expressions

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz against CPython `ipaddress` itself — the reference
  * implementation the IP kernel claims parity with. A seeded generator
  * produces ~2000 structured candidates (valid quads/hextets plus
  * mutations: leading zeros, wrong octet counts, bad masks, zones,
  * garbage); CPython evaluates `int(ip_interface(s))` for each, and the
  * kernel must agree EXACTLY — same accepts, same rejects, same values.
  * Skipped (not failed) where no python3 is available. */
class IpKernelFuzzSpec extends AnyFunSuite {

  private def python3Available: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import ipaddress").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  test("parseInterface agrees with CPython ip_interface on 2000 fuzzed inputs") {
    assume(python3Available, "python3 with ipaddress not available")
    val rng = new scala.util.Random(20260812L)
    def octet(): String = rng.nextInt(4) match {
      case 0 => rng.nextInt(256).toString
      case 1 => rng.nextInt(300).toString // sometimes out of range
      case 2 => "0" + rng.nextInt(100) // leading zeros
      case _ => rng.nextInt(10).toString
    }
    def hextet(): String = rng.nextInt(5) match {
      case 0 => Integer.toHexString(rng.nextInt(0x10000))
      case 1 => Integer.toHexString(rng.nextInt(0x10000)).toUpperCase
      case 2 => "0" * rng.nextInt(4) + Integer.toHexString(rng.nextInt(16))
      case 3 => Integer.toHexString(rng.nextInt(0x100000)) // sometimes 5 digits
      case _ => if (rng.nextBoolean()) "g" + rng.nextInt(10) else ""
    }
    def v4(): String = (1 to (3 + rng.nextInt(3))).map(_ => octet()).mkString(".")
    def v6(): String = {
      val n = 1 + rng.nextInt(9)
      val parts = (1 to n).map(_ => hextet())
      val base = parts.mkString(":")
      rng.nextInt(4) match {
        case 0 => "::" + base
        case 1 => base + "::"
        case 2 if n > 2 =>
          val cut = 1 + rng.nextInt(n - 1)
          parts.take(cut).mkString(":") + "::" + parts.drop(cut).mkString(":")
        case _ => base
      }
    }
    def suffix(): String = rng.nextInt(6) match {
      case 0 => "/" + rng.nextInt(140)
      case 1 => "/0" + rng.nextInt(40)
      case 2 => "/" + v4()
      case 3 => "/" + rng.nextInt(33)
      case 4 => "//" + rng.nextInt(24)
      case _ => ""
    }
    def zone(): String =
      if (rng.nextInt(5) == 0) "%" + (if (rng.nextBoolean()) "eth0" else "") else ""
    val candidates = (1 to 2000).map { _ =>
      rng.nextInt(10) match {
        case 0 => v4() + zone() + suffix()
        case 1 | 2 | 3 => v4() + suffix()
        case 4 | 5 | 6 => v6() + zone() + suffix()
        case 7 => v6() + suffix()
        case 8 => v6().replace(":", "") + suffix() // degenerate
        case _ => Seq("", ":", "::", ".", "1.2.3.4.", ".1.2.3.4", " 1.2.3.4",
          "1.2.3.4 ", "1:2:3:4:5:6:1.2.3.4", "::ffff:" + v4())(rng.nextInt(10))
      }
    }.distinct

    val inFile = Files.createTempFile("ipfuzz", ".txt")
    Files.write(inFile, candidates.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val script =
      """import ipaddress, sys
        |for line in open(sys.argv[1], encoding='utf-8').read().split('\n'):
        |    try:
        |        print(int(ipaddress.ip_interface(line)))
        |    except ValueError:
        |        print('None')
        |""".stripMargin
    val scriptFile = Files.createTempFile("ipfuzz", ".py")
    Files.write(scriptFile, script.getBytes(StandardCharsets.UTF_8))
    val proc = new ProcessBuilder("python3", scriptFile.toString, inFile.toString)
      .redirectErrorStream(false).start()
    val expected = new String(proc.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8).trim.split("\n")
    assert(proc.waitFor() == 0)
    assert(expected.length === candidates.length)

    val mismatches = candidates.zip(expected).flatMap { case (s, want) =>
      val got = Option(IpKernel.parseInterface(s)).map(_.value.toString).getOrElse("None")
      if (got != want) Some(s"'$s': kernel=$got cpython=$want") else None
    }
    assert(mismatches.isEmpty,
      s"${mismatches.length} divergences, first 10:\n${mismatches.take(10).mkString("\n")}")
  }
}
