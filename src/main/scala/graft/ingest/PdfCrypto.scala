package graft.ingest

/** Standard-security-handler crypto for encrypted PDFs: RC4 (/V 1–2)
  * and AES-128-CBC (/V 4 /AESV2) per PDF 32000-1 §7.6.3, plus the
  * AES-256-CBC handlers (/V 5 /AESV3, /R 5 and the ISO 32000-2 §7.6.4
  * /R 6 with its iterated 2.B hash) — the common "viewer-openable"
  * EMPTY user password (the file opens without a prompt, but its
  * streams are still encrypted) AND caller-supplied user passwords.
  * Candidate keys are VALIDATED against /U before use, so a wrong or
  * missing password degrades to empty extraction instead of feeding
  * garbage plaintext to the filter decoders. The reference gets all of
  * this from PDFium (pdf_processor.cpp:88-95); this is the JDK-only
  * equivalent, shared by [[CharPdfExtractor]] (decrypt) and
  * [[PdfSampleDoc]] (the encrypted fixture twins encrypt with the same
  * primitives, so a drift in either direction breaks the byte-parity
  * spec).
  *
  * Out of subset: crypt filters other than the document-default /StdCF.
  */
private[graft] object PdfCrypto {

  /** The 32-byte password pad (PDF §7.6.3.3, Algorithm 2 step a). An
    * empty user password IS the pad. */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 — symmetric, so this is both encrypt and decrypt. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    var n = 0
    while (n < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(n) = (data(n) ^ s((s(i) + s(j)) & 0xff)).toByte
      n += 1
    }
    out
  }

  /** Algorithm 2 step a: the user password padded/truncated to exactly
    * 32 bytes — an empty password IS the pad. */
  def paddedPassword(password: Array[Byte]): Array[Byte] =
    (password.take(32) ++ Pad).take(32)

  /** Algorithm 2 file key: MD5(padded password ‖ O ‖ P as 4-byte
    * little-endian signed ‖ ID₀ ‖ FFFFFFFF when /R ≥ 4 with
    * /EncryptMetadata false), re-hashed 50× over the first n bytes for
    * /R ≥ 3; n = Length/8 (5 for /R 2). Default password = empty (the
    * viewer-openable case). */
  def fileKey(o: Array[Byte], p: Int, id0: Array[Byte],
              r: Int, lengthBits: Int,
              encryptMetadata: Boolean = true,
              password: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val n = if (r == 2) 5 else lengthBits / 8
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    val metaExt =
      if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xff.toByte)
      else Array.emptyByteArray
    var digest = md5(paddedPassword(password), o, pLe, id0, metaExt)
    if (r >= 3)
      for (_ <- 0 until 50) digest = md5(digest.take(n))
    digest.take(n)
  }

  /** Algorithm 3 steps a–d: the RC4 key derived from the padded OWNER
    * password — MD5, then for /R ≥ 3 fifty MD5 re-hashes of the FULL
    * 16-byte output (unlike Algorithm 2's first-n-bytes iteration),
    * truncated to n bytes. */
  def ownerKey(ownerPw: Array[Byte], r: Int, lengthBits: Int): Array[Byte] = {
    val n = if (r == 2) 5 else lengthBits / 8
    var d = md5(paddedPassword(ownerPw))
    if (r >= 3) for (_ <- 0 until 50) d = md5(d)
    d.take(n)
  }

  /** Algorithm 3 /O entry (write side): the padded USER password
    * RC4-encrypted under the owner key — plus the 19 XORed-key rounds
    * for /R ≥ 3. */
  def ownerValue(ownerPw: Array[Byte], userPw: Array[Byte],
                 r: Int, lengthBits: Int): Array[Byte] = {
    val key = ownerKey(ownerPw, r, lengthBits)
    var o = rc4(key, paddedPassword(userPw))
    if (r >= 3) for (i <- 1 to 19) o = rc4(key.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithm 7 core: decrypt /O with a candidate OWNER password,
    * yielding the (padded) user password — RC4 is an involution, so the
    * /R ≥ 3 rounds unwind in reverse XOR order. The caller feeds the
    * result through the normal Algorithm 2 + /U validation (feeding a
    * 32-byte pad through [[paddedPassword]] is the identity). */
  def userPadFromOwner(ownerPw: Array[Byte], o: Array[Byte],
                       r: Int, lengthBits: Int): Array[Byte] = {
    val key = ownerKey(ownerPw, r, lengthBits)
    if (r == 2) rc4(key, o)
    else {
      var d = o
      for (i <- 19 to 0 by -1) d = rc4(key.map(b => (b ^ i).toByte), d)
      d
    }
  }

  /** The /U value a candidate file key implies: Algorithm 4 (/R 2,
    * RC4(key, pad)) or Algorithm 5 (/R ≥ 3, RC4 chain over MD5(pad ‖
    * ID₀) with per-round XORed keys; 16 significant bytes). */
  def userValue(fileKey: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fileKey, Pad)
    else {
      var u = rc4(fileKey, md5(Pad, id0))
      for (i <- 1 to 19) u = rc4(fileKey.map(b => (b ^ i).toByte), u)
      u
    }

  /** Validate a candidate file key against the stored /U (Algorithm 4/5
    * comparison: full 32 bytes for /R 2, first 16 for /R ≥ 3). */
  def checkUser(fileKey: Array[Byte], id0: Array[Byte], r: Int,
                stored: Array[Byte]): Boolean = {
    val n = if (r == 2) 32 else 16
    val expect = userValue(fileKey, id0, r)
    stored.length >= n && java.util.Arrays.equals(expect.take(n), stored.take(n))
  }

  // ---- AES-256 handlers (/V 5): /R 5 (deprecated ExtensionLevel 3) and
  // ---- /R 6 (ISO 32000-2 §7.6.4.3.4, the "hardened" 2.B hash)

  def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  /** ISO 32000-2 Algorithm 2.B (the /R 6 iterated hash): start from
    * SHA-256(password ‖ salt ‖ udata); each round builds K1 = 64
    * repetitions of (password ‖ K ‖ udata), AES-128-CBC-encrypts it with
    * key = K[0..16), IV = K[16..32), re-hashes E with SHA-256/384/512
    * chosen by (Σ E[0..16)) mod 3, and stops after round ≥ 64 when
    * E.last ≤ round − 32. /R 5 uses the plain single SHA-256 instead. */
  def hash2B(password: Array[Byte], salt: Array[Byte],
             udata: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    var k = sha256(password, salt, udata)
    var round = 0
    var e = Array.emptyByteArray
    while (round < 64 || (e.last & 0xff) > round - 32) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      for (i <- 0 until 64) System.arraycopy(block, 0, k1, i * block.length, block.length)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      e = c.doFinal(k1)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      val alg = mod match { case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512" }
      val d = java.security.MessageDigest.getInstance(alg)
      k = d.digest(e)
      round += 1
    }
    k.take(32)
  }

  /** The /R 5/6 user-password hash over a salt slice of /U: plain
    * SHA-256(pw ‖ salt) for /R 5, the 2.B iteration for /R 6. Passwords
    * are truncated to 127 bytes per spec. */
  def aes256Hash(r: Int, password: Array[Byte], salt: Array[Byte]): Array[Byte] = {
    val pw = password.take(127)
    if (r == 5) sha256(pw, salt) else hash2B(pw, salt)
  }

  /** Validate a user password against the 48-byte /U (32-byte hash ‖
    * 8-byte validation salt ‖ 8-byte key salt). */
  def checkUserAes256(r: Int, password: Array[Byte], u: Array[Byte]): Boolean =
    u.length >= 48 && java.util.Arrays.equals(
      aes256Hash(r, password, u.slice(32, 40)), u.take(32))

  /** Recover the 32-byte file key from /UE: AES-256-CBC-decrypt (zero IV,
    * no padding) under the intermediate key SHA/2.B(pw ‖ key salt). */
  def aes256FileKey(r: Int, password: Array[Byte], u: Array[Byte],
                    ue: Array[Byte]): Array[Byte] = {
    val ik = aes256Hash(r, password, u.slice(40, 48))
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ik, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    c.doFinal(ue.take(32))
  }

  /** The /UE value for a chosen file key (fixture direction). */
  def aes256UserKeyEntry(r: Int, password: Array[Byte], u: Array[Byte],
                         fileKey: Array[Byte]): Array[Byte] = {
    val ik = aes256Hash(r, password, u.slice(40, 48))
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ik, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    c.doFinal(fileKey.take(32))
  }

  /** Algorithm 1 per-object key: MD5(fileKey ‖ obj low 3 LE ‖ gen low 2
    * LE ‖ "sAlT" for AES), truncated to min(n+5, 16). */
  def objectKey(fileKey: Array[Byte], obj: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val ext = Array[Byte](
      (obj & 0xff).toByte, ((obj >> 8) & 0xff).toByte, ((obj >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
    md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
  }

  private def aesCipher(mode: Int, key: Array[Byte], iv: Array[Byte]) = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c
  }

  /** Decrypt one string/stream's bytes under the per-object key — or,
    * for the AES-256 handlers (32-byte file key), under the FILE key
    * directly (V5 has no per-object derivation, spec §7.6.3.1). AES
    * payloads carry their IV as the first 16 bytes and PKCS#7-style
    * padding (always present, 1–16 bytes). */
  def decrypt(fileKey: Array[Byte], obj: Int, gen: Int, aes: Boolean,
              data: Array[Byte]): Array[Byte] = {
    val k = if (aes && fileKey.length == 32) fileKey
            else objectKey(fileKey, obj, gen, aes)
    if (!aes) rc4(k, data)
    else if (data.length < 32 || data.length % 16 != 0) data // malformed: pass through
    else {
      val plain = aesCipher(javax.crypto.Cipher.DECRYPT_MODE, k, data.take(16))
        .doFinal(data.drop(16))
      val pad = plain.last & 0xff
      if (pad >= 1 && pad <= 16 && pad <= plain.length) plain.dropRight(pad) else plain
    }
  }

  /** Encrypt (the fixture direction). The AES IV is derived
    * deterministically from the object number so fixture bytes are
    * reproducible run to run. */
  def encrypt(fileKey: Array[Byte], obj: Int, gen: Int, aes: Boolean,
              data: Array[Byte]): Array[Byte] = {
    val k = if (aes && fileKey.length == 32) fileKey
            else objectKey(fileKey, obj, gen, aes)
    if (!aes) rc4(k, data)
    else {
      val iv = md5(s"graft-iv-$obj-$gen".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val padLen = 16 - (data.length % 16)
      val padded = data ++ Array.fill(padLen)(padLen.toByte)
      iv ++ aesCipher(javax.crypto.Cipher.ENCRYPT_MODE, k, iv).doFinal(padded)
    }
  }
}
