package graft.sources

/** SASL/SCRAM/TLS security surface for every Kafka-touching path
  * (reference: kafka/tls.rs, kafka/scram.rs, kafka/sasl/, CLI
  * commands/security_args.rs).
  *
  * The reference drives librdkafka; on Spark the whole surface is pure
  * option pass-through — the Kafka source/sink forwards every `kafka.`-
  * prefixed option to the Java client. The mapping is NOT 1:1 with the
  * reference's librdkafka keys: librdkafka's `ssl.ca.location` family
  * becomes the Java client's PEM-typed truststore/keystore options
  * (supported since Kafka 2.7), and SASL credentials become a
  * `sasl.jaas.config` login-module string rather than plain
  * username/password keys.
  */
final case class KafkaSecurityConfig(
    securityProtocol: String = "PLAINTEXT", // PLAINTEXT | SSL | SASL_PLAINTEXT | SASL_SSL
    saslMechanism: Option[String] = None, // PLAIN | SCRAM-SHA-256 | SCRAM-SHA-512 | GSSAPI
    saslUsername: Option[String] = None,
    saslPassword: Option[String] = None,
    sslCaCertPath: Option[String] = None, // PEM bundle with the broker CA(s)
    sslClientCertPath: Option[String] = None, // PEM client cert chain (mTLS)
    sslClientKeyPath: Option[String] = None, // PEM client private key (mTLS)
    kerberosServiceName: Option[String] = None, // broker's sasl.kerberos.service.name
    kerberosKeytabPath: Option[String] = None, // unset → ticket cache (kinit)
    kerberosPrincipal: Option[String] = None)

object KafkaSecurity {

  /** Protocol names the reference accepts (security_args.rs
    * parse_security_protocol) — anything else falls back to PLAINTEXT there;
    * here we reject it instead of silently downgrading security.
    */
  private val Protocols = Set("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")

  /** Mechanism spelling normalization: the reference's CLI accepts
    * `SCRAM-SHA256` / `SCRAM-SHA512` (scram.rs), the Java client wants
    * `SCRAM-SHA-256` / `SCRAM-SHA-512`.
    */
  /** Read a PEM file for inlining into a keystore option — loud on failure
    * (a missing credential must fail the job at config time, not surface as
    * an opaque handshake error later).
    */
  private def readPem(path: String, what: String): String =
    try new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(s"cannot read $what PEM at $path: $e")
    }

  def normalizeMechanism(m: String): String = m.trim.toUpperCase match {
    case "SCRAM-SHA256" | "SCRAM-SHA-256" => "SCRAM-SHA-256"
    case "SCRAM-SHA512" | "SCRAM-SHA-512" => "SCRAM-SHA-512"
    case other => other
  }

  /** JAAS string values: double-quoted, with backslash and double-quote
    * escaped — an adversarial password must not break out of the config.
    */
  private def jaasQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Regex covering every secret-bearing option key this builder can emit.
    * Spark's redactor matches option KEYS, and its DEFAULT
    * `spark.redaction.regex` (`secret|password|token|access.key`) matches
    * neither `ssl.keystore.key` (value: the inlined PEM private key) nor
    * `sasl.jaas.config` (value embeds the SASL password) — so those values
    * surface unredacted. A session that attaches [[options]] to a reader
    * should extend the redaction conf AT BUILD TIME (it is a core conf,
    * immutable at runtime):
    * {{{
    * .config("spark.redaction.regex",
    *         "(?i)secret|password|token|access[.]key|" +
    *         KafkaSecurity.SensitiveOptionRegex)
    * }}}
    */
  val SensitiveOptionRegex: String =
    "(?i)ssl[.]keystore[.]key|sasl[.]jaas[.]config"

  /** Option keys in `opts` whose VALUES hold key material or credentials but
    * which the session's current `spark.redaction.regex` would NOT redact —
    * i.e. they could surface verbatim in logs, event logs, or the UI. Empty
    * means safe. Callers that cannot rebuild the session can at least refuse
    * or warn on a non-empty gap.
    */
  def redactionGaps(redactionRegex: String,
                    opts: Map[String, String]): Seq[String] = {
    val sensitive = SensitiveOptionRegex.r
    val redaction = redactionRegex.r
    opts.keys.toSeq.sorted.filter(k =>
      sensitive.findFirstIn(k).isDefined &&
        redaction.findFirstIn(k).isEmpty)
  }

  /** [[redactionGaps]] against the session's effective redaction conf. */
  def redactionGaps(spark: org.apache.spark.sql.SparkSession,
                    opts: Map[String, String]): Seq[String] =
    redactionGaps(spark.conf.get("spark.redaction.regex",
      "(?i)secret|password|token|access[.]key"), opts)

  /** Build the `kafka.`-prefixed option map for
    * `spark.read/readStream.format("kafka").options(...)` and for the
    * producer/AdminClient legs (same keys, unprefixed, via [[clientOptions]]).
    *
    * SECURITY: with mTLS the private key and with SASL the password are
    * INLINE VALUES in this map (Kafka's PEM keystore and JAAS formats require
    * it). See [[SensitiveOptionRegex]] / [[redactionGaps]] before attaching
    * the map to anything Spark logs.
    */
  def options(cfg: KafkaSecurityConfig): Map[String, String] =
    clientOptions(cfg).map { case (k, v) => s"kafka.$k" -> v }

  /** The raw Java-client option map (no `kafka.` prefix) — what a
    * KafkaProducer/AdminClient Properties would take.
    */
  def clientOptions(cfg: KafkaSecurityConfig): Map[String, String] = {
    val proto = cfg.securityProtocol.trim.toUpperCase
    require(Protocols.contains(proto),
      s"unknown security.protocol '${cfg.securityProtocol}' (expected one of ${Protocols.toSeq.sorted.mkString(", ")})")
    val b = Map.newBuilder[String, String]
    if (proto != "PLAINTEXT") b += "security.protocol" -> proto

    val saslNeeded = proto.startsWith("SASL_")
    val mech = cfg.saslMechanism.map(normalizeMechanism)
    if (saslNeeded) {
      val m = mech.getOrElse(throw new IllegalArgumentException(
        s"sasl mechanism is required when security.protocol is $proto"))
      b += "sasl.mechanism" -> m
      m match {
        case "PLAIN" | "SCRAM-SHA-256" | "SCRAM-SHA-512" =>
          val user = cfg.saslUsername.getOrElse(throw new IllegalArgumentException(
            s"sasl username is required for $m"))
          val pass = cfg.saslPassword.getOrElse(throw new IllegalArgumentException(
            s"sasl password is required for $m"))
          val module =
            if (m == "PLAIN") "org.apache.kafka.common.security.plain.PlainLoginModule"
            else "org.apache.kafka.common.security.scram.ScramLoginModule"
          b += "sasl.jaas.config" ->
            s"$module required username=${jaasQuote(user)} password=${jaasQuote(pass)};"
        case "GSSAPI" =>
          b += "sasl.kerberos.service.name" -> cfg.kerberosServiceName.getOrElse("kafka")
          val jaas = cfg.kerberosKeytabPath match {
            case Some(keytab) =>
              val principal = cfg.kerberosPrincipal.getOrElse(
                throw new IllegalArgumentException(
                  "kerberos principal is required when a keytab is given"))
              "com.sun.security.auth.module.Krb5LoginModule required " +
                s"useKeyTab=true storeKey=true keyTab=${jaasQuote(keytab)} " +
                s"principal=${jaasQuote(principal)};"
            case None => // OS ticket cache (kinit), like the reference's default
              "com.sun.security.auth.module.Krb5LoginModule required " +
                "useTicketCache=true;"
          }
          b += "sasl.jaas.config" -> jaas
        case other =>
          throw new IllegalArgumentException(s"unsupported sasl mechanism '$other'")
      }
    } else if (mech.isDefined) {
      throw new IllegalArgumentException(
        s"sasl mechanism given but security.protocol is $proto")
    }

    val sslNeeded = proto == "SSL" || proto == "SASL_SSL"
    if (sslNeeded) {
      cfg.sslCaCertPath.foreach { ca =>
        b += "ssl.truststore.type" -> "PEM"
        b += "ssl.truststore.location" -> ca
      }
      (cfg.sslClientCertPath, cfg.sslClientKeyPath) match {
        case (Some(cert), Some(key)) =>
          // separate cert/key files must be INLINED: Kafka's PEM keystore
          // accepts either ssl.keystore.location (ONE file holding key +
          // chain) or ssl.keystore.key + ssl.keystore.certificate.chain as
          // PEM CONTENT — location combined with key is rejected by
          // DefaultSslEngineFactory, and key-as-a-path never parses
          b += "ssl.keystore.type" -> "PEM"
          b += "ssl.keystore.key" -> readPem(key, "client key")
          b += "ssl.keystore.certificate.chain" -> readPem(cert, "client cert")
        case (None, None) => ()
        case _ => throw new IllegalArgumentException(
          "mTLS needs BOTH client cert and client key (one was missing)")
      }
    } else {
      require(cfg.sslCaCertPath.isEmpty && cfg.sslClientCertPath.isEmpty &&
        cfg.sslClientKeyPath.isEmpty,
        s"ssl options given but security.protocol is $proto")
    }
    b.result()
  }

  /** Environment-variable resolution mirroring the reference CLI
    * (security_args.rs into_security_config): credentials come from
    * KAFKA_USERNAME / KAFKA_PASSWORD, the CA bundle from
    * KAFKA_SSL_CA_CERT, mechanism fallback from KAFKA_SASL_MECHANISM —
    * flags win over environment.
    */
  def fromEnv(protocol: String,
              mechanism: Option[String] = None,
              env: String => Option[String] = k => sys.env.get(k)): KafkaSecurityConfig = {
    val proto = protocol.trim.toUpperCase
    val mech = mechanism.orElse(env("KAFKA_SASL_MECHANISM"))
    val needsCreds = proto.startsWith("SASL_") &&
      mech.map(normalizeMechanism).exists(m => m == "PLAIN" || m.startsWith("SCRAM-"))
    KafkaSecurityConfig(
      securityProtocol = proto,
      saslMechanism = if (proto.startsWith("SASL_")) mech else None,
      saslUsername = if (needsCreds) env("KAFKA_USERNAME") else None,
      saslPassword = if (needsCreds) env("KAFKA_PASSWORD") else None,
      sslCaCertPath = if (proto == "SSL" || proto == "SASL_SSL") env("KAFKA_SSL_CA_CERT") else None,
      kerberosServiceName = env("KAFKA_SASL_KERBEROS_SERVICE_NAME"),
      kerberosKeytabPath = env("KAFKA_SASL_KEYTAB"),
      // keytab auth is unusable without the principal — must be env-reachable
      kerberosPrincipal = env("KAFKA_SASL_PRINCIPAL"))
  }
}
