package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Perceptual fingerprints over REAL codec round-trips — the multimodal
  * near-dup tier (image dHash, audio energy fingerprint).
  *
  * Oracle discipline: PNG and 16-bit PCM WAV are LOSSLESS, so a fixture
  * image/waveform rendered deterministically from document text decodes
  * back to the exact pixel/sample integers the text defines. The Spark
  * side therefore runs the REAL pipeline (encode → `javax.imageio` /
  * `javax.sound.sampled` decode → integer fingerprint math) while the
  * DuckDB oracle replays only the pure integer algebra on the text —
  * bit-for-bit equality is the test that the codec path preserves the
  * raster/PCM exactly. Everything downstream of decode is integer
  * arithmetic (block sums, energy sums, comparison bits), never floats,
  * so both engines agree exactly.
  *
  * Reference analog: CLI-RAG fingerprints whole documents with one
  * rolling hash (`vector-db.c`); this tier is the same
  * content-addressing idea lifted to media columns, where "equal bytes"
  * is too strict and block-structure hashes (dHash) are the standard
  * near-dup key.
  */
object Perceptual {

  /** Image side: 32×32 8-bit grayscale; dHash on the 8×8 block-mean
    * grid → 8 rows × 7 horizontal comparisons = 56 bits (fits a
    * positive BIGINT, so DuckDB's signed shifts never wrap).
    */
  val ImgW = 32
  val ImgH = 32
  val Grid = 8 // 8×8 blocks of 4×4 pixels
  val DhashBits = 56 // 8 rows × 7 comparisons
  val BandBits = 14 // 4 bands × 14 bits: pigeonhole-exact for hamming ≤ 3
  val NumBands = DhashBits / BandBits

  /** Render document text as a real 32×32 grayscale PNG: pixel p
    * (row-major, p ∈ [0, 1024)) = codepoint of text[(p mod n)] & 0xff.
    * The cyclic layout is locality-preserving — editing one character
    * moves ~⌈1024/n⌉ pixels, so near-dup texts render near-dup images.
    */
  def textToPng(text: String): Array[Byte] = {
    require(text.nonEmpty, "textToPng: empty text")
    val img = new BufferedImage(ImgW, ImgH, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val n = text.length
    var p = 0
    while (p < ImgW * ImgH) {
      raster.setSample(p % ImgW, p / ImgW, 0, text.charAt(p % n).toInt & 0xff)
      p += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: PNG bytes → the 64 block sums of the 8×8 grid (each
    * block is 4×4 pixels, integer sum of decoded gray samples). Reads
    * raster samples directly (no sRGB conversion), so the sums equal
    * what the text algebra predicts — the lossless round-trip.
    */
  def blockSums(png: Array[Byte]): Array[Long] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "ImageIO cannot decode this payload")
    require(img.getWidth == ImgW && img.getHeight == ImgH,
      s"expected ${ImgW}x$ImgH, got ${img.getWidth}x${img.getHeight}")
    val raster = img.getRaster
    val sums = new Array[Long](Grid * Grid)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        sums((y / 4) * Grid + (x / 4)) += raster.getSample(x, y, 0)
        x += 1
      }
      y += 1
    }
    sums
  }

  /** dHash over the block grid: bit k (k = r*7 + c, r ∈ [0,8), c ∈
    * [0,7)) is set iff blockSum(r, c) > blockSum(r, c+1). 56 bits.
    */
  def dhash(sums: Array[Long]): Long = {
    var bits = 0L
    var k = 0
    while (k < DhashBits) {
      val r = k / 7
      val c = k % 7
      if (sums(r * Grid + c) > sums(r * Grid + c + 1)) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** text → real PNG → real ImageIO decode → dHash, in one call (the
    * per-row executor path; bytes never leave the scan stage).
    */
  def textDhash(text: String): Long = dhash(blockSums(textToPng(text)))

  /** Audio side: 16-bit signed PCM mono WAV at 8 kHz; each character
    * becomes [[SamplesPerChar]] samples of a ±amp square wave with
    * amp = (codepoint mod 128) * 128 — integer, clipping-free
    * (127*128 = 16256 < 32768). 16 energy blocks over the character
    * axis; fingerprint = 15 greater-than bits between adjacent blocks.
    */
  val SampleRate = 8000
  val SamplesPerChar = 16
  val EnergyBlocks = 16
  val FingerprintBits: Int = EnergyBlocks - 1

  /** Render text as a real RIFF/WAVE file (PCM 16-bit LE mono). */
  def textToWav(text: String): Array[Byte] = {
    require(text.nonEmpty, "textToWav: empty text")
    val n = text.length
    val nSamples = n * SamplesPerChar
    val dataBytes = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(SampleRate)
      .putInt(SampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < nSamples) {
      val amp = (text.charAt(i / SamplesPerChar).toInt % 128) * 128
      out.putShort((if (i % 2 == 0) amp else -amp).toShort)
      i += 1
    }
    out.array()
  }

  /** REAL decode: WAV bytes → 16 block energies, descaled back to the
    * text algebra's units. `javax.sound.sampled` parses the container;
    * block j of character i is min(15, i*16/n); each character's
    * [[SamplesPerChar]] samples contribute samples² = amp² each, so the
    * raw PCM energy is SamplesPerChar * 128² * Σ (cp mod 128)² — divided
    * back down so the oracle's per-character Σ (cp mod 128)² falls out
    * exactly (integer division with zero remainder, by construction).
    */
  def wavEnergies(wav: Array[Byte]): (Array[Long], Long) = {
    val in = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(wav))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"expected 16-bit LE mono PCM, got $fmt")
      val pcm = in.readAllBytes()
      val nSamples = pcm.length / 2
      val nChars = nSamples / SamplesPerChar
      val energies = new Array[Long](EnergyBlocks)
      var i = 0
      while (i < nSamples) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toLong // signed LE
        val blk = math.min(EnergyBlocks - 1, (i / SamplesPerChar) * EnergyBlocks / nChars)
        energies(blk) += s * s
        i += 1
      }
      var j = 0
      while (j < EnergyBlocks) {
        energies(j) /= SamplesPerChar.toLong * 128 * 128
        j += 1
      }
      (energies, nSamples.toLong)
    } finally in.close()
  }

  /** 15-bit fingerprint: bit j set iff energy(j+1) > energy(j). */
  def energyFingerprint(energies: Array[Long]): Long = {
    var bits = 0L
    var j = 0
    while (j < FingerprintBits) {
      if (energies(j + 1) > energies(j)) bits |= 1L << j
      j += 1
    }
    bits
  }

  /** text → real WAV → real javax.sound decode → (fingerprint, frames). */
  def textAudioFingerprint(text: String): (Long, Long) = {
    val (energies, frames) = wavEnergies(textToWav(text))
    (energyFingerprint(energies), frames)
  }
}
