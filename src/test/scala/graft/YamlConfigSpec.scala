package graft

import graft.codec.CompressionCodec
import graft.config.YamlConfig
import java.nio.file.Files

/** YAML config front-end (config.rs:8, cli/commands/config.rs:6-30):
  * field mapping onto BackupConfig/RestoreConfig/KafkaSecurityConfig,
  * `${VAR}` env expansion semantics, and a run-config end-to-end drive.
  */
class YamlConfigSpec extends SparkSpec {

  private def write(text: String): String = {
    val p = Files.createTempFile("graft-yaml", ".yaml")
    Files.write(p, text.getBytes("UTF-8"))
    p.toString
  }

  test("backup config parses the reference example's field surface") {
    val job = YamlConfig.parse(
      """mode: backup
        |backup_id: "b-2025-001"
        |source:
        |  bootstrap_servers:
        |    - broker-1:9092
        |    - broker-2:9092
        |  security:
        |    security_protocol: SASL_SSL
        |    sasl_mechanism: SCRAM-SHA-512
        |    sasl_username: "svc-backup"
        |    sasl_password: "${GRAFT_PW}"
        |    ssl_ca_location: "/etc/ca.crt"
        |  topics:
        |    include: ["orders", "events-*"]
        |    exclude: ["__consumer_offsets", "*-changelog"]
        |storage:
        |  backend: filesystem
        |  path: "/var/backups"
        |  prefix: "cluster-prod"
        |backup:
        |  segment_max_bytes: 1048576
        |  segment_max_interval_ms: 60000
        |  compression: lz4
        |  compression_level: 5
        |  continuous: true
        |offset_storage:
        |  db_path: /data/offsets.db
        |metrics:
        |  enabled: true
        |  port: 9404
        |""".stripMargin,
      env = Map("GRAFT_PW" -> "s3cret").get)
    assert(job.mode == "backup" && job.backupId == "b-2025-001")
    assert(job.bootstrapServers == Seq("broker-1:9092", "broker-2:9092"))
    assert(job.storageRoot == "/var/backups/cluster-prod")
    assert(job.continuous && job.incremental && job.metricsEnabled && job.metricsPort == 9404)
    assert(job.offsetDbPath.contains("/data/offsets.db"))
    val sec = job.security.get
    assert(sec.securityProtocol == "SASL_SSL")
    assert(sec.saslMechanism.contains("SCRAM-SHA-512"))
    assert(sec.saslPassword.contains("s3cret"), "env-expanded credential must reach the config")
    assert(sec.sslCaCertPath.contains("/etc/ca.crt"))
    val b = job.backup.get
    assert(b.compression == CompressionCodec.Lz4 && b.zstdLevel == 5)
    assert(b.maxSegmentBytes == 1048576L)
    assert(b.maxSegmentIntervalMs.contains(60000L))
    assert(b.includeTopics == Seq("orders", "events-*"))
    assert(b.excludeTopics == Seq("__consumer_offsets", "*-changelog"))
  }

  test("restore config parses mappings, window, dry-run and rate limits") {
    val job = YamlConfig.parse(
      """mode: restore
        |backup_id: rb1
        |target:
        |  bootstrap_servers: [localhost:9092]
        |storage:
        |  path: "/var/backups"
        |restore:
        |  time_window_start: 1700000000000
        |  time_window_end: 1700000600000
        |  source_partitions: [0, 2]
        |  topic_mapping:
        |    orders: orders-dr
        |  partition_mapping:
        |    0: 4
        |  dry_run: true
        |  rate_limit_records_per_sec: 5000
        |""".stripMargin)
    val r = job.restore.get
    assert(r.windowStartMs.contains(1700000000000L) && r.windowEndMs.contains(1700000600000L))
    assert(r.sourcePartitions.contains(Seq(0, 2)))
    assert(r.topicMapping == Map("orders" -> "orders-dr"))
    assert(r.partitionMapping == Map(0 -> 4))
    assert(job.dryRun && job.rateLimitRecordsPerSec.contains(5000L))
    assert(job.backup.isEmpty)
  }

  test("expandEnvVars: set, unset, and unterminated ${ (pinned divergence)") {
    val env = Map("A" -> "x", "EMPTY" -> "").get _
    assert(YamlConfig.expandEnvVars("pre-${A}-post", env) == "pre-x-post")
    // unset → empty string (config.rs semantics, warning on stderr)
    assert(YamlConfig.expandEnvVars("v=${MISSING}!", env) == "v=!")
    assert(YamlConfig.expandEnvVars("v=${EMPTY}!", env) == "v=!")
    // adjacent + repeated
    assert(YamlConfig.expandEnvVars("${A}${A}", env) == "xx")
    // no escape syntax: a bare $ passes through
    assert(YamlConfig.expandEnvVars("cost $5", env) == "cost $5")
    // DIVERGENCE (documented in the scaladoc): an unterminated ${ stays
    // literal text; config.rs would consume the rest as a variable name
    assert(YamlConfig.expandEnvVars("broken ${TAIL", env) == "broken ${TAIL")
  }

  test("missing required fields fail loudly; unknown mode rejected") {
    intercept[IllegalArgumentException](YamlConfig.parse("backup_id: x\nstorage: {path: /t}\n"))
    intercept[IllegalArgumentException](
      YamlConfig.parse("mode: backup\nstorage: {path: /t}\n"))
    intercept[IllegalArgumentException](
      YamlConfig.parse("mode: compact\nbackup_id: x\nstorage: {path: /t}\n"))
    intercept[IllegalArgumentException](YamlConfig.parse("mode: backup\nbackup_id: x\n"))
  }

  test("run-config drives backup then restore end-to-end from YAML (reference UX)") {
    val root = Files.createTempDirectory("graft-yaml-root").toString
    val outDir = Files.createTempDirectory("graft-yaml-out").toString
    // PATH is always set in the test environment: exercises the default
    // sys.env expansion path through Cli.run → YamlConfig.load
    val backupYaml = write(
      s"""mode: backup
         |backup_id: ycli1
         |source:
         |  bootstrap_servers: [localhost:9092]
         |  security:
         |    security_protocol: SASL_PLAINTEXT
         |    sasl_mechanism: PLAIN
         |    sasl_username: svc
         |    sasl_password: "$${PATH}"
         |storage:
         |  path: "$root"
         |backup:
         |  compression: none
         |  segment_max_bytes: 262144
         |""".stripMargin)
    Cli.run(spark, Array("run-config", backupYaml, sf0001))
    val m = graft.catalog.Manifest.load(root, "ycli1")
    assert(m.totalRecords > 0, "backup via YAML config must write a manifest")

    val restoreYaml = write(
      s"""mode: restore
         |backup_id: ycli1
         |target:
         |  bootstrap_servers: [localhost:9092]
         |storage:
         |  path: "$root"
         |restore: {}
         |""".stripMargin)
    Cli.run(spark, Array("run-config", restoreYaml, outDir))
    assert(spark.read.parquet(outDir).count() == m.totalRecords)

    // the YAML's topic_mapping must reach the written output (regression:
    // the restore leg once called Restore.records, which stops BEFORE the
    // remap stage — configured renames were silently dropped)
    val remapOut = Files.createTempDirectory("graft-yaml-remap").toString
    val remapYaml = write(
      s"""mode: restore
         |backup_id: ycli1
         |target:
         |  bootstrap_servers: [localhost:9092]
         |storage:
         |  path: "$root"
         |restore:
         |  topic_mapping:
         |    click: click-v2
         |""".stripMargin)
    Cli.run(spark, Array("run-config", remapYaml, remapOut))
    val topics = spark.read.parquet(remapOut)
      .select("topic").distinct().collect().map(_.getString(0)).toSet
    assert(topics.contains("click-v2") && !topics.contains("click"),
      s"topic_mapping must apply to run-config restore output: $topics")
  }

  test("run-config seeds resume marks from offset_storage.db_path (migration path)") {
    // the golden reference offsets.db claims marks for backup-2025-00 on
    // topics that don't exist in the events fixture — so the seeded state
    // must not drop any records, but MUST land in the state table
    val dbBytes = {
      val in = getClass.getResourceAsStream("/fixtures/offsets-ref.db")
      try in.readAllBytes() finally in.close()
    }
    val db = java.nio.file.Files.createTempFile("offsets-mig", ".db")
    java.nio.file.Files.write(db, dbBytes)
    val root = java.nio.file.Files.createTempDirectory("graft-yaml-mig").toString
    val yaml = write(
      s"""mode: backup
         |backup_id: backup-2025-00
         |source:
         |  bootstrap_servers: [localhost:9092]
         |storage:
         |  path: "$root"
         |backup:
         |  compression: none
         |offset_storage:
         |  db_path: "$db"
         |""".stripMargin)
    Cli.run(spark, Array("run-config", yaml, sf0001))
    val marks = graft.catalog.OffsetStateTable.lastOffsets(spark, root, "backup-2025-00")
    assert(marks(("orders", 0)) == 0L, "sqlite marks must be seeded before the backup")
    assert(marks.exists(_._1._1 == "click"), "the backup's own marks must land too")
    assert(graft.catalog.Manifest.load(root, "backup-2025-00").totalRecords > 0)
  }
}
