package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** EXHAUSTIVE resize-invariance certification of the perceptual planted
  * patterns (ADVICE r12): the image/audio/video dedup oracles restate
  * `n_matched = n_planted` as an exact count, justified by the claim that
  * every planted pattern's perceptual hash survives its re-encode
  * transform within the band budget. The patterns are pure functions of
  * the doc id's LOW 16 BITS, so instead of trusting measurement at a
  * scale factor (~5000 of 65536 residues at sf0.1), these tests iterate
  * ALL 65536 residues through the exact executor-side pure functions —
  * no Spark, a few seconds — plus real codec round trips on a stride
  * (PNG/GIF/WAV are lossless for these payloads, so the strided codec
  * checks pin the raw-path ≙ codec-path equivalence the full sweeps
  * lean on).
  */
class MultimodalInvarianceSpec extends AnyFunSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def pngRoundTrip(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
  }

  private def gifRoundTrip(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
  }

  test("image lane: dHash survives 2x bilinear resize for ALL 65536 residues") {
    javax.imageio.ImageIO.setUseCache(false)
    var worst = 0
    var id = 0L
    while (id < 65536L) {
      val orig = Multimodal.renderBlockImage(id, 32, 24)
      // the q_image_dedup transform: 32x24 gray -> 64x48 BGR (resizeImages)
      val resized = Multimodal.resizeBilinear(orig, 64, 48,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val d = hamming(Multimodal.dhashOf(orig), Multimodal.dhashOf(resized))
      if (d > worst) worst = d
      assert(d <= 3, s"residue $id drifted $d dHash bits under 2x resize")
      id += 1L
    }
    info(s"worst image dHash drift across 65536 residues: $worst bits")
  }

  test("image lane: strided PNG codec round trip is pixel-faithful to the raw path") {
    javax.imageio.ImageIO.setUseCache(false)
    var id = 0L
    while (id < 65536L) {
      val raw = Multimodal.renderBlockImage(id, 32, 24)
      val viaPng = pngRoundTrip(raw)
      assert(Multimodal.dhashOf(viaPng) === Multimodal.dhashOf(raw))
      val resizedPng = pngRoundTrip(Multimodal.resizeBilinear(viaPng, 64, 48,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR))
      val resizedRaw = Multimodal.resizeBilinear(raw, 64, 48,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      assert(Multimodal.dhashOf(resizedPng) === Multimodal.dhashOf(resizedRaw),
        s"PNG round trip changed the resized dHash at residue $id")
      id += 251L
    }
  }

  test("audio lane: envelope fingerprint survives 2x linear resample for ALL 65536 residues") {
    var worst = 0
    var id = 0L
    while (id < 65536L) {
      val s = Multimodal.blockToneSamples(id, 2080)
      val d = hamming(Multimodal.envelopeFingerprint(s),
        Multimodal.envelopeFingerprint(Multimodal.resampleLinear(s, 2)))
      if (d > worst) worst = d
      assert(d <= 3, s"residue $id drifted $d envelope bits under 2x resample")
      id += 1L
    }
    info(s"worst audio envelope drift across 65536 residues: $worst bits")
  }

  test("video lane: structured frame dHash survives the GIF encode->2x resize->re-encode trip") {
    javax.imageio.ImageIO.setUseCache(false)
    // the structured frame pattern is blockValue16 — identical pixels to
    // renderBlockImage — so the 65536-residue sweep above covers the raw
    // invariance; this strided pass adds the REAL per-frame GIF trip of
    // q_video_dedup (encode -> decode -> bilinear 2x -> re-encode ->
    // decode -> dHash), where palette quantization could in principle
    // perturb blend pixels.
    var id = 0L
    while (id < 65536L) {
      val raw = Multimodal.renderBlockImage(id, 32, 24)
      val decoded = gifRoundTrip(raw)
      val resized = gifRoundTrip(Multimodal.resizeBilinear(decoded, 64, 48,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY))
      val d = hamming(Multimodal.dhashOf(raw), Multimodal.dhashOf(resized))
      assert(d <= 3, s"residue $id drifted $d dHash bits through the GIF trip")
      id += 17L
    }
  }
}
