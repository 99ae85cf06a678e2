package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Public-suffix registrable-domain extraction (the Mozilla PSL
 * algorithm): politeness, blocklists and host statistics should group
 * by the REGISTRABLE domain — `a.example.co.uk` and `b.example.co.uk`
 * are one site — not the raw hostname, and label math alone gets
 * `co.uk`/`com.br`-style multi-label suffixes wrong. The reference has
 * no equivalent (it groups by raw netloc); this is a production-crawl
 * addition, same motivation as [[Blocklist]].
 *
 * Rules follow the public_suffix_list.dat format: a plain suffix
 * (`co.uk`), a wildcard (`*.ck` — every single-label extension of the
 * base is itself a public suffix), and an exception (`!www.ck` — wins
 * over any wildcard/plain match; its suffix minus the leading label is
 * the public suffix). The prevailing match is the one with the most
 * labels (exceptions always prevail, per spec); with no match the
 * default rule `*` applies (the bare TLD is public). The registrable
 * domain is the public suffix plus one label; a host that IS a public
 * suffix has none (null).
 *
 * [[SeedRules]] is a representative ICANN subset for offline use — the
 * full ~10^4-entry public_suffix_list.dat drops in as data through the
 * same parameter. Evaluation is a per-row HOF chain over the host's
 * dot-suffixes ([[Blocklist.hostSuffixes]] semantics) with the rules
 * compiled into literal suffix→label-count maps: whole-stage codegen,
 * no join, no shuffle — right for the DISTINCT-hosts dimension or
 * inline in an enrichment projection. (At full-PSL scale the literal
 * map is a few hundred KB in the plan; a broadcast-join form against a
 * rules table is the [[Blocklist.admit]]-style alternative when that
 * matters.)
 */
object PublicSuffix {

  /** ICANN seed subset + the classic wildcard/exception pair. */
  val SeedRules: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "io", "co", "ai", "dev", "app", "uk", "jp", "au", "br",
    "cn", "de", "fr", "it", "nl", "es", "se", "no", "fi", "dk", "pl",
    "ru", "in", "kr", "tw", "hk", "sg", "mx", "ar", "tr", "za", "nz",
    "il", "ca", "us", "ch", "at", "be", "cz", "pt", "gr", "hu", "ro",
    "ie", "my", "ph", "vn", "id", "th", "sa", "eg", "pk", "bd", "pe",
    "ve", "cl", "uy",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "ltd.uk", "plc.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "lg.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "co.za", "org.za", "web.za", "net.za", "gov.za", "ac.za",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
    "com.ve", "net.ve", "org.ve", "co.ve", "gob.ve",
    "*.ck", "!www.ck")

  private def nLabels(s: String): Int = s.count(_ == '.') + 1

  /** Rules compiled to (exact suffix → public-label count,
   *  wildcard base → count, exception suffix → count). Shared with the
   *  SQL-oracle generator so operator and replay cannot drift. */
  private[graft] def compile(rules: Seq[String])
      : (Map[String, Int], Map[String, Int], Map[String, Int]) = {
    val exact = Map.newBuilder[String, Int]
    val wild = Map.newBuilder[String, Int]
    val exc = Map.newBuilder[String, Int]
    rules.iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).foreach { r =>
      if (r.startsWith("!")) {
        val e = r.drop(1)
        require(e.contains("."), s"exception rule needs >=2 labels: $r")
        exc += e -> (nLabels(e) - 1)
      } else if (r.startsWith("*.")) {
        val b = r.drop(2)
        wild += b -> (nLabels(b) + 1)
      } else exact += r -> nLabels(r)
    }
    (exact.result(), wild.result(), exc.result())
  }

  /** Shared PSL resolution: normalized label array, label count, and
   *  the prevailing public-suffix label count `p`. A wildcard rule
   *  `*.base` only matches hosts with MORE labels than the base — the
   *  base itself falls through to the remaining rules (`kawasaki.jp`
   *  under `*.kawasaki.jp` resolves via `jp`, not via the wildcard) —
   *  hence the `x <= k` guard on the wildcard candidates. */
  private def resolve(host: Column, rules: Seq[String])
      : (Column, Column, Column) = {
    val (exact, wild, exc) = compile(rules)
    val exactM = typedlit(exact)
    val wildM = typedlit(wild)
    val excM = typedlit(exc)
    val norm = regexp_replace(lower(trim(host)), "\\.$", "")
    val labels = filter(split(norm, "\\."), l => l =!= "")
    val k = size(labels)
    val sufs = when(k > 0,
        transform(sequence(lit(1), k),
          i => array_join(slice(labels, i, k), ".")))
      .otherwise(array().cast("array<string>"))
    def lens(m: Column): Column =
      filter(transform(sufs, s => element_at(m, s)), x => x.isNotNull)
    val excLens = lens(excM)
    // default rule `*`: an unlisted TLD is a 1-label public suffix
    val candLens = concat(lens(exactM),
      filter(lens(wildM), x => x <= k), array(lit(1)))
    val p = when(size(excLens) > 0, array_min(excLens))
      .otherwise(array_max(candLens))
    (labels, k, p)
  }

  /** Registrable domain of `host` under `rules`, null when the host IS
   *  a public suffix (or empty/null). Normalizes like
   *  [[Blocklist.hostSuffixes]]: lowercase, trim, drop one trailing
   *  dot. */
  def registeredDomain(host: Column,
      rules: Seq[String] = SeedRules): Column = {
    val (labels, k, p) = resolve(host, rules)
    when(k > p, array_join(slice(labels, k - p, p + lit(1)), "."))
      .otherwise(lit(null).cast("string"))
  }

  /** The matched public suffix itself (null only for empty hosts):
   *  `a.example.co.uk` → `co.uk`; `b.ck` → `b.ck` (wildcard). */
  def publicSuffix(host: Column, rules: Seq[String] = SeedRules): Column = {
    val (labels, k, p) = resolve(host, rules)
    when(k > 0, array_join(slice(labels, k - p + lit(1), p), "."))
      .otherwise(lit(null).cast("string"))
  }
}
