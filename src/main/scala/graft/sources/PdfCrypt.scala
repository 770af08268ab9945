package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import scala.collection.mutable

import PdfCodec._

/** Standard security handler (ISO 32000 §7.6) — the read path for the
  * overwhelmingly common "encrypted, but empty user password" document
  * the reference opens transparently through PyMuPDF (`app.py:241`,
  * `fixed_signature_utils.py:63-96`: `fitz.open` on arbitrary user
  * uploads). Pure JDK: MD5/SHA via `MessageDigest`, AES-CBC via
  * `javax.crypto`, RC4 implemented inline (20 lines — ARCFOUR's JCE
  * availability varies by vendor, the algorithm does not).
  *
  * Supported shapes, keyed by the /Encrypt dict:
  *   - V1/R2  RC4-40      (classic Acrobat 2/3)
  *   - V2/R3  RC4-40..128 (Acrobat 4/5 — /Length bits)
  *   - V4/R4  crypt filters /StdCF with /CFM /V2 (RC4) or /AESV2
  *            (AES-128-CBC, 16-byte IV prefix, PKCS#5)
  *   - V5/R6  /AESV3 (AES-256-CBC, SHA-2 iterated key derivation —
  *            the PDF 2.0 / Acrobat X+ default)
  *
  * Anything else — a non-empty user password (algorithm 4/5/11 check
  * fails), a non-/Standard handler, /CFM /Identity asymmetries — is a
  * LOUD typed reject so [[PdfCodec.checkPdf]] can report WHY, never a
  * silent mis-read.
  *
  * The write side ([[encryptPdf]]) exists for the fixture family and
  * specs: it re-serializes a parsed document with every stream/string
  * encrypted and a conforming /Encrypt dict + /ID, giving the oracle
  * gate a deterministic encrypted corpus with a closed-form pixel sum
  * (the [[PdfCodec.composePredictorFixture]] pattern).
  *
  * Scale shape: key derivation runs once per document (driver-free,
  * inside the same per-row codec call as the rest of [[PdfCodec]]);
  * per-object work is one MD5 + one RC4/AES pass over bytes already
  * in hand. Nothing here touches Spark state.
  */
object PdfCrypt {

  /** ISO 32000 §7.6.3.3 padding string (algorithms 2-5). */
  private[sources] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def digest(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance(alg)
    parts.foreach(md.update)
    md.digest()
  }
  private def md5(parts: Array[Byte]*): Array[Byte] = digest("MD5", parts: _*)

  /** RC4 (symmetric — same routine encrypts and decrypts). */
  private[sources] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0; var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def aes(mode: Int, transform: String, key: Array[Byte],
                  iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance(transform)
    if (iv == null) c.init(mode, new SecretKeySpec(key, "AES"))
    else c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }
  private[sources] def aesCbcNoPad(enc: Boolean, key: Array[Byte], iv: Array[Byte],
                                   data: Array[Byte]): Array[Byte] =
    aes(if (enc) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE, "AES/CBC/NoPadding", key, iv, data)
  private def aesEcbNoPad(enc: Boolean, key: Array[Byte], data: Array[Byte]): Array[Byte] =
    aes(if (enc) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE, "AES/ECB/NoPadding", key, null, data)

  /** PDF AES payload: IV(16) ‖ CBC(PKCS#5-padded plaintext). Padding
    * is stripped manually so a corrupt tail throws the codec's own
    * typed message, not a provider-specific exception.
    */
  private def aesDecryptPdf(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(data.length >= 32 && data.length % 16 == 0,
      s"PDF decrypt: AES payload length ${data.length} not IV + padded blocks")
    val plain = aesCbcNoPad(enc = false, key, data.take(16), data.drop(16))
    val padLen = plain(plain.length - 1) & 0xff
    require(padLen >= 1 && padLen <= 16 && padLen <= plain.length,
      s"PDF decrypt: bad AES padding $padLen")
    java.util.Arrays.copyOfRange(plain, 0, plain.length - padLen)
  }
  private def aesEncryptPdf(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (data.length % 16)
    val padded = java.util.Arrays.copyOf(data, data.length + padLen)
    java.util.Arrays.fill(padded, data.length, padded.length, padLen.toByte)
    iv ++ aesCbcNoPad(enc = true, key, iv, padded)
  }

  private def le32(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(b => (b & 0xff).toByte)

  // ------------------------------------------------------------------
  // key derivation
  // ------------------------------------------------------------------

  /** Algorithm 2 (R2-R4): file key from the (padded empty) user
    * password. `n` = key bytes (Length/8; 5 when R=2).
    */
  private def fileKeyR234(o: Array[Byte], p: Int, id0: Array[Byte], r: Int, n: Int,
                          encryptMetadata: Boolean): Array[Byte] = {
    val extra = if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xff.toByte)
                else Array.emptyByteArray
    var h = md5(Pad, o, le32(p), id0, extra)
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h.take(n)); i += 1 } }
    h.take(n)
  }

  /** Algorithms 4/5: the /U value an EMPTY user password would
    * produce — compared against the document's /U to verify.
    */
  private def userValueR234(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u
    }

  /** Algorithm 2.B (R6): the SHA-2 iterated hash. `udata` is empty for
    * the user-password variants and the 48-byte /U for owner ones.
    */
  private[sources] def hashR6(pwd: Array[Byte], salt: Array[Byte],
                              udata: Array[Byte]): Array[Byte] = {
    var k = digest("SHA-256", pwd, salt, udata)
    var round = 0
    var e: Array[Byte] = Array.emptyByteArray
    var done = false
    while (!done) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      e = aesCbcNoPad(enc = true, k.take(16), k.slice(16, 32), k1)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = digest(if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else "SHA-512", e)
      round += 1
      done = round >= 64 && (e(e.length - 1) & 0xff) <= round - 32
    }
    k.take(32)
  }

  // ------------------------------------------------------------------
  // the resolved handler
  // ------------------------------------------------------------------

  /** Cipher selector: how strings/streams are transformed. */
  private[sources] sealed trait Cfm
  private[sources] case object CfmRc4 extends Cfm
  private[sources] case object CfmAesV2 extends Cfm
  private[sources] case object CfmAesV3 extends Cfm
  private[sources] case object CfmIdentity extends Cfm

  /** A verified, ready-to-decrypt handler: `fileKey` + cipher. */
  final case class Encryption private[sources] (
      private[sources] val fileKey: Array[Byte],
      private[sources] val cfm: Cfm,
      encryptObjNum: Int) {

    /** Per-object key (algorithm 1) — V≤4 only; AESV3 uses the file
      * key directly (algorithm 1.A).
      */
    private def objectKey(num: Int, gen: Int): Array[Byte] = {
      val ext = Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
      val salt = if (cfm == CfmAesV2) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
      md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
    }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (data.isEmpty) data // a /Length 0 stream has no ciphertext to strip
      else cfm match {
        case CfmIdentity => data
        case CfmRc4      => rc4(objectKey(num, gen), data)
        case CfmAesV2    => aesDecryptPdf(objectKey(num, gen), data)
        case CfmAesV3    => aesDecryptPdf(fileKey, data)
      }

    /** Fixture-side inverse; `iv` must be 16 bytes for the AES modes
      * (deterministic fixtures pass a seed-derived IV).
      */
    private[sources] def encrypt(num: Int, gen: Int, iv: Array[Byte],
                                 data: Array[Byte]): Array[Byte] = cfm match {
      case CfmIdentity => data
      case CfmRc4      => rc4(objectKey(num, gen), data)
      case CfmAesV2    => aesEncryptPdf(objectKey(num, gen), iv, data)
      case CfmAesV3    => aesEncryptPdf(fileKey, iv, data)
    }
  }

  private def pstr(v: Option[PVal], what: String): Array[Byte] = v match {
    case Some(PStr(b)) => b
    case other => throw new IllegalArgumentException(
      s"PDF decrypt: /Encrypt $what must be a string, got $other")
  }
  private def pint(v: Option[PVal], dflt: Int): Int = v match {
    case Some(PNum(n)) => n.toInt
    case _ => dflt
  }

  /** Resolve + verify an /Encrypt dictionary against the EMPTY user
    * password. Typed throws (surfaced by [[PdfCodec.checkPdf]]):
    * non-Standard handler, unsupported V/R, crypt-filter shapes out of
    * subset, and — the common real-world reject — a document whose
    * user password is NOT empty.
    */
  private[sources] def resolveHandler(resolve: PVal => PVal, encDict: PDict,
                                      id0: Array[Byte], encryptObjNum: Int): Encryption = {
    resolve(encDict.get("Filter").getOrElse(PNull)) match {
      case PName("Standard") =>
      case other => throw new IllegalArgumentException(
        s"PDF decrypt: security handler $other is out of subset (/Standard only)")
    }
    val v = pint(encDict.get("V").map(resolve), 0)
    val r = pint(encDict.get("R").map(resolve), 0)
    val p = pint(encDict.get("P").map(resolve), -1)
    val o = pstr(encDict.get("O").map(resolve), "/O")
    val u = pstr(encDict.get("U").map(resolve), "/U")
    val encryptMetadata = resolve(encDict.get("EncryptMetadata").getOrElse(PBool(true))) match {
      case PBool(b) => b
      case _ => true
    }

    def stdCfm: Cfm = {
      // V4/V5 route through crypt filters: /StmF and /StrF name an
      // entry in /CF. Identity/StdCF with a single /CFM is the only
      // real-world layout; asymmetric stream-vs-string filters are a
      // loud reject rather than a half-decrypted document.
      val stmF = resolve(encDict.get("StmF").getOrElse(PName("Identity")))
      val strF = resolve(encDict.get("StrF").getOrElse(PName("Identity")))
      require(stmF == strF, s"PDF decrypt: asymmetric /StmF $stmF vs /StrF $strF is out of subset")
      stmF match {
        case PName("Identity") => CfmIdentity
        case PName(cfName) =>
          val cf = resolve(encDict.get("CF").getOrElse(PNull)) match {
            case d: PDict => resolve(d.get(cfName).getOrElse(PNull))
            case _ => PNull
          }
          cf match {
            case d: PDict => resolve(d.get("CFM").getOrElse(PNull)) match {
              case PName("V2")    => CfmRc4
              case PName("AESV2") => CfmAesV2
              case PName("AESV3") => CfmAesV3
              case PName("None") | PNull => CfmIdentity
              case other => throw new IllegalArgumentException(
                s"PDF decrypt: /CFM $other is out of subset (V2/AESV2/AESV3)")
            }
            case _ => throw new IllegalArgumentException(
              s"PDF decrypt: crypt filter /$cfName missing from /CF")
          }
        case other => throw new IllegalArgumentException(s"PDF decrypt: bad /StmF $other")
      }
    }

    v match {
      case 1 | 2 =>
        val n = if (v == 1) 5 else math.max(5, math.min(16, pint(encDict.get("Length").map(resolve), 40) / 8))
        require(r == 2 || r == 3, s"PDF decrypt: V=$v with R=$r is out of subset")
        val key = fileKeyR234(o, p, id0, r, n, encryptMetadata)
        val expect = userValueR234(key, id0, r)
        val ok = if (r == 2) java.util.Arrays.equals(expect, u.take(32))
                 else expect.take(16).sameElements(u.take(16))
        require(ok, "PDF decrypt: password-protected (empty user password rejected)")
        Encryption(key, CfmRc4, encryptObjNum)
      case 4 =>
        require(r == 4, s"PDF decrypt: V=4 with R=$r is out of subset")
        val cfm = stdCfm
        val n = math.max(5, math.min(16, pint(encDict.get("Length").map(resolve), 128) / 8))
        val key = fileKeyR234(o, p, id0, r, n, encryptMetadata)
        val expect = userValueR234(key, id0, r)
        require(expect.take(16).sameElements(u.take(16)),
          "PDF decrypt: password-protected (empty user password rejected)")
        Encryption(key, cfm, encryptObjNum)
      case 5 =>
        require(r == 6 || r == 5, s"PDF decrypt: V=5 with R=$r is out of subset")
        require(u.length >= 48, s"PDF decrypt: V=5 /U must be 48 bytes, got ${u.length}")
        val cfm = stdCfm
        require(cfm == CfmAesV3, s"PDF decrypt: V=5 requires /AESV3")
        val vSalt = u.slice(32, 40)
        val kSalt = u.slice(40, 48)
        val expect =
          if (r == 6) hashR6(Array.emptyByteArray, vSalt, Array.emptyByteArray)
          else digest("SHA-256", Array.emptyByteArray, vSalt)
        require(expect.sameElements(u.take(32)),
          "PDF decrypt: password-protected (empty user password rejected)")
        val ue = pstr(encDict.get("UE").map(resolve), "/UE")
        require(ue.length == 32, s"PDF decrypt: /UE must be 32 bytes, got ${ue.length}")
        val ik = if (r == 6) hashR6(Array.emptyByteArray, kSalt, Array.emptyByteArray)
                 else digest("SHA-256", Array.emptyByteArray, kSalt)
        val fileKey = aesCbcNoPad(enc = false, ik, new Array[Byte](16), ue)
        Encryption(fileKey, CfmAesV3, encryptObjNum)
      case other => throw new IllegalArgumentException(
        s"PDF decrypt: /V $other is out of subset (1/2/4/5)")
    }
  }

  // ------------------------------------------------------------------
  // fixture write side
  // ------------------------------------------------------------------

  /** Deterministic bytes from a seed — fixture salts/IVs (SHA-256
    * counter mode; no RNG, same bytes every run).
    */
  private def seedBytes(seed: Long, label: String, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    var ctr = 0
    while (off < n) {
      val h = digest("SHA-256",
        s"graft-pdfcrypt-$label-$seed-$ctr".getBytes(StandardCharsets.ISO_8859_1))
      val take = math.min(32, n - off)
      System.arraycopy(h, 0, out, off, take)
      off += take
      ctr += 1
    }
    out
  }

  /** Encrypted-fixture variants, cycled by the query's `doc_id % 4`. */
  val VariantNames: Vector[String] = Vector("rc4-40", "rc4-128", "aes-128", "aes-256")

  private[sources] final case class Built(encDictBody: String, enc: Encryption)

  /** Build a conforming /Encrypt dict (empty user AND owner password)
    * + the matching handler for `variant`: 0=V1/R2 RC4-40, 1=V2/R3
    * RC4-128, 2=V4/R4 AESV2, 3=V5/R6 AESV3.
    */
  private[sources] def buildHandler(variant: Int, seed: Long, id0: Array[Byte],
                                    encryptObjNum: Int): Built = {
    val p = -44 // print+copy denied — an arbitrary but typical perms mask
    def hex(b: Array[Byte]): String = "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"
    variant match {
      case 0 | 1 =>
        val (v, r, bits) = if (variant == 0) (1, 2, 40) else (2, 3, 128)
        val n = bits / 8
        // O for empty owner password (algorithm 3)
        var okey = md5(Pad)
        if (r >= 3) { var i = 0; while (i < 50) { okey = md5(okey.take(n)); i += 1 } }
        val ok = okey.take(n)
        var o = rc4(ok, Pad)
        if (r >= 3) { var i = 1; while (i <= 19) { o = rc4(ok.map(b => (b ^ i).toByte), o); i += 1 } }
        val key = fileKeyR234(o, p, id0, r, n, encryptMetadata = true)
        val u0 = userValueR234(key, id0, r)
        val u = if (r == 2) u0 else u0 ++ seedBytes(seed, "upad", 16)
        val body = s"<< /Filter /Standard /V $v /R $r /Length $bits " +
          s"/O ${hex(o)} /U ${hex(u)} /P $p >>"
        Built(body, Encryption(key, CfmRc4, encryptObjNum))
      case 2 =>
        val n = 16
        var okey = md5(Pad)
        var i = 0
        while (i < 50) { okey = md5(okey.take(n)); i += 1 }
        val ok = okey.take(n)
        var o = rc4(ok, Pad)
        i = 1
        while (i <= 19) { o = rc4(ok.map(b => (b ^ i).toByte), o); i += 1 }
        val key = fileKeyR234(o, p, id0, r = 4, n, encryptMetadata = true)
        val u = userValueR234(key, id0, r = 3) ++ seedBytes(seed, "upad", 16)
        val body = s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
          s"/O ${hex(o)} /U ${hex(u)} /P $p >>"
        Built(body, Encryption(key, CfmAesV2, encryptObjNum))
      case _ =>
        val fileKey = seedBytes(seed, "filekey", 32)
        val vSalt = seedBytes(seed, "vsalt", 8)
        val kSalt = seedBytes(seed, "ksalt", 8)
        val empty = Array.emptyByteArray
        val u = hashR6(empty, vSalt, empty) ++ vSalt ++ kSalt
        val ue = aesCbcNoPad(enc = true, hashR6(empty, kSalt, empty), new Array[Byte](16), fileKey)
        val ovSalt = seedBytes(seed, "ovsalt", 8)
        val okSalt = seedBytes(seed, "oksalt", 8)
        val o = hashR6(empty, ovSalt, u) ++ ovSalt ++ okSalt
        val oe = aesCbcNoPad(enc = true, hashR6(empty, okSalt, u), new Array[Byte](16), fileKey)
        val permsPlain = le32(p) ++ Array.fill[Byte](4)(0xff.toByte) ++
          "Tadb".getBytes(StandardCharsets.ISO_8859_1) ++ seedBytes(seed, "perms", 4)
        val perms = aesEcbNoPad(enc = true, fileKey, permsPlain)
        val body = s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
          s"/O ${hex(o)} /U ${hex(u)} /OE ${hex(oe)} /UE ${hex(ue)} " +
          s"/Perms ${hex(perms)} /P $p /EncryptMetadata true >>"
        Built(body, Encryption(fileKey, CfmAesV3, encryptObjNum))
    }
  }

  // ------------------------------------------------------------------
  // generic object serializer (fixture write side)
  // ------------------------------------------------------------------

  private def fmtNum(d: Double): String =
    if (d == math.rint(d)) d.toLong.toString else d.toString

  private def serializeVal(v: PVal, sb: StringBuilder,
                           encStr: Array[Byte] => Array[Byte]): Unit = v match {
    case PNull      => sb.append("null")
    case PBool(b)   => sb.append(b)
    case PNum(d)    => sb.append(fmtNum(d))
    case PName(s)   =>
      sb.append('/')
      s.foreach { c =>
        if (c <= ' ' || "()<>[]{}/%#".indexOf(c) >= 0) sb.append(f"#${c.toInt}%02X")
        else sb.append(c)
      }
    case PStr(b)    =>
      sb.append('<')
      encStr(b).foreach(x => sb.append(f"${x & 0xff}%02X"))
      sb.append('>')
    case PRef(n, g) => sb.append(n).append(' ').append(g).append(" R")
    case PArr(items) =>
      sb.append("[ ")
      items.foreach { it => serializeVal(it, sb, encStr); sb.append(' ') }
      sb.append(']')
    case PDict(m) =>
      sb.append("<< ")
      m.foreach { case (k, vv) =>
        serializeVal(PName(k), sb, encStr); sb.append(' ')
        serializeVal(vv, sb, encStr); sb.append(' ')
      }
      sb.append(">>")
  }

  /** Re-serialize a parsed document with every stream and string
    * encrypted under `variant`, appending a conforming /Encrypt dict
    * and a deterministic /ID. Fixture/spec support: input documents
    * must be plain scanned objects (no ObjStm containers — true of
    * every [[PdfCodec.compose]]/[[PdfCodec.composePredictorFixture]]
    * output). Deterministic bytes for a given (input, variant, seed).
    */
  def encryptPdf(plain: Array[Byte], variant: Int, seed: Long): Array[Byte] = {
    val doc = PdfCodec.parse(plain)
    val id0 = digest("MD5", seedBytes(seed, "docid", 16))
    val encNum = doc.maxObjNum + 1
    val Built(encBody, enc) = buildHandler(((variant % 4) + 4) % 4, seed, id0, encNum)

    val out = new ByteArrayOutputStream(plain.length + 2048)
    val offsets = mutable.LinkedHashMap[Int, Int]()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))

    w("%PDF-1.6\n%âãÏÓ\n")
    doc.order.foreach { num =>
      val obj = doc.objects(num)
      offsets(num) = out.size()
      w(s"$num ${obj.gen} obj\n")
      val encStream = obj.rawStream.map { raw =>
        enc.encrypt(num, obj.gen, seedBytes(seed ^ num.toLong, "iv", 16), raw)
      }
      // stream dicts carry the ENCRYPTED length
      val value = (obj.value, encStream) match {
        case (d: PDict, Some(es)) => PDict(d.m.updated("Length", PNum(es.length.toDouble)))
        case (v2, _) => v2
      }
      val sb = new StringBuilder
      serializeVal(value, sb, b => enc.encrypt(num, obj.gen, seedBytes(seed ^ num.toLong, "siv", 16), b))
      w(sb.toString)
      encStream match {
        case Some(es) =>
          w("\nstream\n"); out.write(es); w("\nendstream\nendobj\n")
        case None => w("\nendobj\n")
      }
    }
    // the /Encrypt dict itself — strings inside it are NOT encrypted
    offsets(encNum) = out.size()
    w(s"$encNum 0 obj\n$encBody\nendobj\n")

    val size = encNum + 1
    val xrefOff = out.size()
    w(s"xref\n0 $size\n")
    w("0000000000 65535 f \n")
    (1 until size).foreach { n =>
      offsets.get(n) match {
        case Some(off) => w(f"$off%010d 00000 n \n")
        case None      => w("0000000000 65535 f \n")
      }
    }
    val idHex = id0.map(b => f"${b & 0xff}%02X").mkString
    val infoEntry = if (doc.infoNum >= 0) s"/Info ${doc.infoNum} 0 R " else ""
    w(s"trailer\n<< /Size $size /Root ${doc.catalogNum} 0 R /Encrypt $encNum 0 R " +
      s"$infoEntry/ID [<$idHex> <$idHex>] >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The encrypted oracle fixture: [[PdfCodec.composePredictorFixture]]
    * (Flate + PNG predictors, closed-form pixels) wrapped in `variant`
    * encryption — one document exercises decrypt → inflate →
    * unpredict → decode → blit under a single pixel-sum gate.
    */
  def composeEncryptedFixture(seed: Long, wPx: Int, hPx: Int, variant: Int): Array[Byte] =
    encryptPdf(PdfCodec.composePredictorFixture(seed, wPx, hPx), variant, seed)
}
