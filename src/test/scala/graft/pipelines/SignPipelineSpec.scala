package graft.pipelines

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** §3.1 composed: real compress + real detached signing + ref-exact
  * renaming, as one plan.
  */
class SignPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val p12: Array[Byte] = {
    val dir = Files.createTempDirectory("graft_p12_pipe")
    val path = dir.resolve("signer.p12").toString
    val keytool = Paths.get(System.getProperty("java.home"), "bin", "keytool").toString
    val proc = new ProcessBuilder(keytool, "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", path,
      "-storepass", "changeit", "-dname", "CN=Pipeline Signer", "-validity", "30")
      .redirectErrorStream(true).start()
    assert(proc.waitFor() == 0, new String(proc.getInputStream.readAllBytes()))
    Files.readAllBytes(Paths.get(path))
  }

  test("sign plan: compressed payload, RSA-2048 signature, SIGNÉ rename, deterministic") {
    val out = SignPipeline.signPlan(Seq(1L, 2L).toDF("doc_id"), p12, "changeit")
      .orderBy("doc_id")
      .as[(Long, String, String, Long, Long, String)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L))
    assert(out.head._2 === "doc_1 SIGNÉ.pdf")
    assert(out.forall(_._3.contains("CN=Pipeline Signer")))
    assert(out.forall(_._4 > 0)) // compressed JPEG payload present
    assert(out.forall(_._5 === 256L)) // RSA-2048 detached signature
    val again = SignPipeline.signPlan(Seq(1L, 2L).toDF("doc_id"), p12, "changeit")
      .orderBy("doc_id").as[(Long, String, String, Long, Long, String)].collect().toSeq
    assert(again === out) // deterministic crypto + codec end-to-end
  }
}
