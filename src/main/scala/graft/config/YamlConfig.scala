package graft.config

import graft.codec.CompressionCodec
import graft.pipelines.{BackupConfig, RestoreConfig}
import graft.sources.KafkaSecurityConfig
import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import scala.jdk.CollectionConverters._

/** The reference's whole UX is `--config backup.yaml`
  * (kafka-backup-core/src/config.rs:8; examples under /root/reference/config/).
  * This is that front-end for the Spark engine: the same YAML field names
  * (`mode`, `backup_id`, `source/target.security`, `storage`, `backup`,
  * `restore`, `offset_storage`, `metrics`), `${VAR}` environment expansion
  * (kafka-backup-cli/src/commands/config.rs:6-30 — unset vars expand to the
  * empty string, with a warning), mapped onto the library's
  * [[BackupConfig]]/[[RestoreConfig]]/[[KafkaSecurityConfig]].
  *
  * Parsing uses snakeyaml's SafeConstructor (plain maps/lists/scalars — no
  * arbitrary object instantiation from untrusted config files).
  */
object YamlConfig {

  /** A parsed job config: what the reference's `Config` struct carries,
    * restricted to the parts this engine executes.
    */
  final case class JobConfig(
      mode: String, // "backup" | "restore"
      backupId: String,
      bootstrapServers: Seq[String],
      security: Option[KafkaSecurityConfig],
      storageRoot: String,
      backup: Option[BackupConfig],
      continuous: Boolean,
      incremental: Boolean, // offset_storage section present
      offsetDbPath: Option[String], // offset_storage.db_path (a SQLite file)
      restore: Option[RestoreConfig],
      dryRun: Boolean,
      rateLimitRecordsPerSec: Option[Long],
      rateLimitBytesPerSec: Option[Long],
      metricsEnabled: Boolean,
      metricsPort: Int)

  /** `${VAR}` → value of VAR; unset → empty string + stderr warning
    * (config.rs expand_env_vars semantics, including no escape syntax).
    *
    * Deliberate divergence: an unterminated `${` (no closing `}`) is kept as
    * literal text here, whereas config.rs consumes the rest of the input as a
    * variable name and expands it (usually to empty). Keeping the text is the
    * safer behavior for a truncated/typo'd config; pinned by YamlConfigSpec.
    */
  def expandEnvVars(input: String,
                    env: String => Option[String] = k => sys.env.get(k)): String = {
    val out = new StringBuilder(input.length)
    var i = 0
    while (i < input.length) {
      if (input.charAt(i) == '$' && i + 1 < input.length && input.charAt(i + 1) == '{') {
        val close = input.indexOf('}', i + 2)
        if (close < 0) { out.append(input.substring(i)); i = input.length }
        else {
          val name = input.substring(i + 2, close)
          env(name) match {
            case Some(v) => out.append(v)
            case None =>
              System.err.println(s"warning: environment variable '$name' is not set, using empty string")
          }
          i = close + 1
        }
      } else {
        out.append(input.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  def load(path: String,
           env: String => Option[String] = k => sys.env.get(k)): JobConfig = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    parse(text, env)
  }

  def parse(yamlText: String,
            env: String => Option[String] = k => sys.env.get(k)): JobConfig = {
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions()))
    val root = yaml.load[java.util.Map[String, AnyRef]](expandEnvVars(yamlText, env))
    require(root != null, "empty config file")
    val m = root.asScala.toMap

    val mode = str(m, "mode").getOrElse(fail("mode"))
    require(mode == "backup" || mode == "restore", s"unknown mode '$mode'")
    val backupId = str(m, "backup_id").getOrElse(fail("backup_id"))

    val storage = sub(m, "storage").getOrElse(fail("storage"))
    val path = str(storage, "path").getOrElse(fail("storage.path"))
    // optional key prefix joins the root (storage.rs prefix semantics)
    val storageRoot = str(storage, "prefix").filter(_.nonEmpty)
      .fold(path)(p => s"$path/$p")

    // backup reads `source`, restore writes to `target` (config.rs:15-21)
    val cluster = sub(m, if (mode == "backup") "source" else "target")
    val servers = cluster.flatMap(c => list(c, "bootstrap_servers")).getOrElse(Nil)
    val security = cluster.flatMap(sub(_, "security")).map(parseSecurity)
    val topics = cluster.flatMap(sub(_, "topics"))
    val include = topics.flatMap(list(_, "include")).getOrElse(Nil)
    val exclude = topics.flatMap(list(_, "exclude")).getOrElse(Nil)

    val b = sub(m, "backup")
    val backupCfg =
      if (mode != "backup") None
      else Some(BackupConfig(
        backupId = backupId,
        backupRoot = storageRoot,
        compression = b.flatMap(str(_, "compression")).map(CompressionCodec.fromName)
          .getOrElse(CompressionCodec.Zstd),
        zstdLevel = b.flatMap(lng(_, "compression_level")).map(_.toInt)
          .getOrElse(CompressionCodec.DefaultZstdLevel),
        maxSegmentBytes = b.flatMap(lng(_, "segment_max_bytes"))
          .getOrElse(128L * 1024 * 1024),
        // Divergence from writer.rs SegmentWriterConfig::default (60_000 ms):
        // an absent key means size-only rolling here. The engine reinterprets
        // the interval as EVENT-time span (batch replays history at arbitrary
        // speed), so a silent 60 s default would shred replayed segments.
        maxSegmentIntervalMs = {
          val iv = b.flatMap(lng(_, "segment_max_interval_ms"))
          if (iv.isEmpty)
            System.err.println("note: segment_max_interval_ms not set; segments roll on " +
              "size only (the reference defaults to 60000 ms of wall-clock time)")
          iv
        },
        enrichHeaders = b.flatMap(bool(_, "include_offset_headers")).getOrElse(true),
        includeTopics = include,
        excludeTopics = exclude))

    val r = sub(m, "restore")
    val restoreCfg =
      if (mode != "restore") None
      else Some(RestoreConfig(
        backupRoot = storageRoot,
        backupId = backupId,
        windowStartMs = r.flatMap(lng(_, "time_window_start")),
        windowEndMs = r.flatMap(lng(_, "time_window_end")),
        includeTopics = include,
        excludeTopics = exclude,
        sourcePartitions = r.flatMap(intList(_, "source_partitions")),
        topicMapping = r.flatMap(sub(_, "topic_mapping")).map(_.map {
          case (k, v) => k -> String.valueOf(v)
        }).getOrElse(Map.empty),
        partitionMapping = r.flatMap(sub(_, "partition_mapping")).map(_.map {
          case (k, v) => k.trim.toInt -> String.valueOf(v).trim.toInt
        }).getOrElse(Map.empty)))

    val metrics = sub(m, "metrics")
    JobConfig(
      mode = mode,
      backupId = backupId,
      bootstrapServers = servers,
      security = security,
      storageRoot = storageRoot,
      backup = backupCfg,
      continuous = b.flatMap(bool(_, "continuous")).getOrElse(false),
      incremental = m.contains("offset_storage"),
      offsetDbPath = sub(m, "offset_storage").flatMap(str(_, "db_path")),
      restore = restoreCfg,
      dryRun = r.flatMap(bool(_, "dry_run")).getOrElse(false),
      rateLimitRecordsPerSec = r.flatMap(lng(_, "rate_limit_records_per_sec")),
      rateLimitBytesPerSec = r.flatMap(lng(_, "rate_limit_bytes_per_sec")),
      metricsEnabled = metrics.flatMap(bool(_, "enabled")).getOrElse(false),
      metricsPort = metrics.flatMap(lng(_, "port")).map(_.toInt).getOrElse(8080))
  }

  /** source/target.security → the Java-client option surface
    * (SecurityConfig, config.rs:193-236; same field names as the YAML
    * examples, librdkafka's ssl_*_location spelling included).
    */
  private def parseSecurity(s: Map[String, AnyRef]): KafkaSecurityConfig =
    KafkaSecurityConfig(
      securityProtocol = str(s, "security_protocol").getOrElse("PLAINTEXT"),
      saslMechanism = str(s, "sasl_mechanism"),
      saslUsername = str(s, "sasl_username"),
      saslPassword = str(s, "sasl_password"),
      sslCaCertPath = str(s, "ssl_ca_location"),
      sslClientCertPath = str(s, "ssl_certificate_location"),
      sslClientKeyPath = str(s, "ssl_key_location"),
      kerberosServiceName = str(s, "sasl_kerberos_service_name"),
      kerberosKeytabPath = str(s, "sasl_keytab_path"),
      kerberosPrincipal = str(s, "sasl_principal"))

  private def fail(field: String): Nothing =
    throw new IllegalArgumentException(s"config is missing required field '$field'")

  private def sub(m: Map[String, AnyRef], k: String): Option[Map[String, AnyRef]] =
    m.get(k).collect { case jm: java.util.Map[_, _] =>
      jm.asScala.map { case (kk, vv) => String.valueOf(kk) -> vv.asInstanceOf[AnyRef] }.toMap
    }

  private def str(m: Map[String, AnyRef], k: String): Option[String] =
    m.get(k).filter(_ != null).map(String.valueOf).filter(_.nonEmpty)

  private def lng(m: Map[String, AnyRef], k: String): Option[Long] =
    m.get(k).collect {
      case n: java.lang.Number => n.longValue()
      case s: String if s.nonEmpty => s.trim.toLong
    }

  private def bool(m: Map[String, AnyRef], k: String): Option[Boolean] =
    m.get(k).collect {
      case b: java.lang.Boolean => b.booleanValue()
      case s: String if s.nonEmpty => s.trim.toBoolean
    }

  private def list(m: Map[String, AnyRef], k: String): Option[Seq[String]] =
    m.get(k).collect { case l: java.util.List[_] =>
      l.asScala.toSeq.filter(_ != null).map(String.valueOf)
    }

  private def intList(m: Map[String, AnyRef], k: String): Option[Seq[Int]] =
    m.get(k).collect { case l: java.util.List[_] =>
      // accept quoted scalars like the sibling str/lng/bool helpers do —
      // silently dropping ["0", "1"] would yield Some(Nil), which Restore
      // reads as "match no partitions": a quietly-empty restore
      l.asScala.toSeq.filter(_ != null).map {
        case n: java.lang.Number => n.intValue()
        case s: String => s.trim.toInt
        case other => throw new IllegalArgumentException(
          s"$k: expected an integer list element, got '$other'")
      }
    }
}
