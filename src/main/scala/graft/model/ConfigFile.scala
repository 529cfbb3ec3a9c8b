package graft.model

/** Config-file surface: the reference's `config.yml`
  * (/root/reference/config.go:13-16 — an `rpc` chain→endpoint map plus
  * `postgres` connection settings, loaded with yaml.v2) parsed from the
  * two-level YAML subset the file actually uses: top-level section keys,
  * one indent level of scalar `key: value` pairs, `#` comments and blank
  * lines. No YAML dependency — the dialect is a dozen lines of structure,
  * and a full YAML parser is not in the allowed dependency set.
  *
  * A reference user's config file drives the same two decisions here that
  * it drives there: WHICH store serves each chain's queries
  * ([[ChainRegistry]], config.go:18-31 → chainservice.go:127-131 one
  * service per chain) and WHERE the JDBC sink writes
  * ([[graft.engine.Sinks.jdbc]]).
  */
object ConfigFile {

  final case class Config(rpc: Map[String, String], postgres: Map[String, String]) {

    /** Chain registry for a deployment: each endpoint resolves to an event
      * store via `resolve` (a live source dials the endpoint; the testbed
      * maps chains to store directories). Unknown chains fall back to
      * `default`, exactly like [[ChainRegistry.single]]. */
    def registry(resolve: (String, String) => String, default: String): ChainRegistry =
      ChainRegistry(rpc.map { case (chain, ep) => chain -> resolve(chain, ep) }, default)

    /** JDBC url + properties from the postgres section — the shape
      * [[graft.engine.Sinks.jdbc]] consumes (the reference builds its DSN
      * from the same four fields, db/db.go). An explicit `url` key wins
      * over the host/name DSN and makes user/password optional, so a
      * deployment can point the `--db` sink at any JDBC database (the
      * specs use embedded Derby — no postgres server in the sandbox). */
    def jdbcTarget: (String, java.util.Properties) = {
      val props = new java.util.Properties()
      postgres.get("url") match {
        case Some(url) =>
          postgres.get("user").foreach(props.setProperty("user", _))
          postgres.get("password").foreach(props.setProperty("password", _))
          postgres.get("driver").foreach(props.setProperty("driver", _))
          (url, props)
        case None =>
          def need(k: String) = postgres.getOrElse(k,
            sys.error(s"config: postgres section lacks '$k'"))
          props.setProperty("user", need("user"))
          props.setProperty("password", need("password"))
          (s"jdbc:postgresql://${need("host")}/${need("name")}", props)
      }
    }
  }

  /** Parse the two-level scalar-map subset. Fails loud on structure it
    * does not understand (an indented line outside any section, or a line
    * with no ':'), rather than silently dropping config. */
  def parse(text: String): Config = {
    val sections = scala.collection.mutable.Map.empty[String, Vector[(String, String)]]
    var current: Option[String] = None
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val noComment = if (raw.trim.startsWith("#")) "" else raw
      if (noComment.trim.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val line = noComment.trim
        val colon = line.indexOf(':')
        require(colon > 0, s"config: line ${i + 1} has no 'key: value' shape: $raw")
        val key = line.substring(0, colon).trim
        // YAML: '#' starts a trailing comment only when preceded by
        // whitespace — 'a#b' (URL fragments) is content
        val v0 = line.substring(colon + 1)
        val cut = v0.indices.find(j => v0(j) == '#' && j > 0 && v0(j - 1).isWhitespace)
        val value = cut.fold(v0)(v0.substring(0, _)).trim
        if (!indented) {
          require(value.isEmpty, s"config: top-level scalar '$key' unsupported (line ${i + 1})")
          current = Some(key)
          sections.getOrElseUpdate(key, Vector.empty)
        } else {
          val sec = current.getOrElse(
            sys.error(s"config: indented line ${i + 1} outside any section: $raw"))
          require(value.nonEmpty, s"config: nested sections unsupported (line ${i + 1}): $raw")
          sections(sec) = sections(sec) :+ (key -> value)
        }
      }
    }
    Config(
      rpc = sections.getOrElse("rpc", Vector.empty).toMap,
      postgres = sections.getOrElse("postgres", Vector.empty).toMap)
  }
}
