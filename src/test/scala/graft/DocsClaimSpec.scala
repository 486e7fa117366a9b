package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-vs-artifact drift guard (VERDICT r12 #3): docs/ROUND12.md asserted
  * `ref_refreshed: true` while the committed BENCH_FULL.json carried
  * `false` — a claim about an artifact flag that the artifact contradicted.
  * This spec mechanically checks every "<artifact>.json ... (`flag: value`)"
  * claim in the CURRENT round doc (the highest-numbered docs/ROUND*.md)
  * against the committed artifact at the repo root.
  *
  * Scope, deliberately conservative:
  *  - only the latest round doc is checked — older docs describe historical
  *    artifact states (BENCH_FULL.json is overwritten every round);
  *  - `~~struck-through~~` spans are ignored (that is how a corrected
  *    overclaim is quoted without re-asserting it);
  *  - a claim binds to EVERY artifact filename within the preceding
  *    300 chars — a bare `flag: value` with no nearby filename is prose.
  *    (ADVICE r13: nearest-only binding silently unguarded the first of
  *    "A.json and B.json each carry `n_pass: 408`" — now a sentence naming
  *    two artifacts checks the claim against both, and a contradiction in
  *    EITHER fails; contrast an old artifact's different value with
  *    strikethrough or >300 chars of distance, not bare prose);
  *  - only top-level scalar keys are compared (booleans, numbers, strings);
  *    nested or absent keys are skipped, not failed — the guard catches
  *    contradictions, it does not enforce completeness.
  */
class DocsClaimSpec extends AnyFunSuite {

  private val ClaimWindow = 300

  private def latestRoundDoc: Option[java.nio.file.Path] = {
    val dir = java.nio.file.Paths.get("docs")
    if (!java.nio.file.Files.isDirectory(dir)) return None
    val rx = """ROUND(\d+)\.md""".r
    val docs = java.nio.file.Files.list(dir).iterator()
    val all = scala.collection.mutable.ArrayBuffer[(Int, java.nio.file.Path)]()
    while (docs.hasNext) {
      val p = docs.next()
      p.getFileName.toString match {
        case rx(n) => all += ((n.toInt, p))
        case _ => ()
      }
    }
    all.sortBy(_._1).lastOption.map(_._2)
  }

  private def scalarOf(n: com.fasterxml.jackson.databind.JsonNode): Option[String] =
    if (n == null) None
    else if (n.isBoolean) Some(n.asBoolean().toString)
    else if (n.isNumber) Some(n.asDouble().toString)
    else if (n.isTextual) Some(n.asText())
    else None

  test("latest docs/ROUND*.md artifact-flag claims match committed artifacts") {
    val docPath = latestRoundDoc.getOrElse(
      fail("no docs/ROUND*.md found"))
    val raw = new String(java.nio.file.Files.readAllBytes(docPath), "UTF-8")
    // struck-through text quotes a RETRACTED claim; it must not re-assert it
    val text = raw.replaceAll("(?s)~~.*?~~", " ")

    val fileRx = """([A-Za-z_][A-Za-z_0-9]*\.json)""".r
    val claimRx = """`([A-Za-z_][A-Za-z_0-9]*): ([^`]{1,60})`""".r
    val files = fileRx.findAllMatchIn(text).map(m => (m.start, m.group(1))).toSeq

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = scala.collection.mutable.Map[String, Option[com.fasterxml.jackson.databind.JsonNode]]()
    def artifact(f: String): Option[com.fasterxml.jackson.databind.JsonNode] =
      parsed.getOrElseUpdate(f, {
        val p = java.nio.file.Paths.get(f)
        if (!java.nio.file.Files.exists(p)) None
        else try Some(mapper.readTree(p.toFile)) catch { case _: Throwable => None }
      })

    val violations = claimRx.findAllMatchIn(text).flatMap { m =>
      val (key, claimedRaw) = (m.group(1), m.group(2).trim)
      // EVERY artifact filename mentioned within the preceding window is
      // checked; a contradiction in any one of them fails the claim
      files.filter(f => f._1 < m.start && m.start - f._1 <= ClaimWindow)
        .map(_._2).distinct.flatMap { fname =>
          artifact(fname).flatMap { root =>
            scalarOf(root.get(key)).flatMap { actual =>
              val claimed = claimedRaw.stripPrefix("\"").stripSuffix("\"")
              val matches =
                claimed == actual ||
                  (try math.abs(claimed.toDouble - actual.toDouble) < 1e-9
                   catch { case _: Throwable => false })
              if (matches) None
              else Some(s"${docPath.getFileName}: claims $fname `$key: $claimed` " +
                s"but the committed artifact carries `$key: $actual`")
            }
          }
        }
    }.toSeq
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
