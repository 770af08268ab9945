package graft.sources

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Properties of the image codec over random dims/seeds/presets:
  * geometry contracts (the ones the oracle gates at fixed dims) hold
  * for EVERY input shape, and the seeded pipeline is a pure function.
  */
object ImageCodecProps extends Properties("graft.imageCodec") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  import ImageCodec._

  private val dimGen = Gen.chooseNum(1, 80)
  private val seedGen = Gen.chooseNum(Long.MinValue, Long.MaxValue)
  private val minimalPreset = Gen.oneOf("minimum", "balanced", "high", "premium", "ultra")
  private val randomPreset = Gen.oneOf("light", "medium", "heavy", "realistic", "old_scanner")

  property("scanEffectsMinimal preserves dims and emits JPEG for any input shape") =
    Prop.forAll(seedGen, dimGen, dimGen, minimalPreset) { (seed, w, h, q) =>
      val out = scanEffectsMinimal(synthPng(seed, w, h), q)
      val px = decode(out)
      isJpeg(out) && px.w == w && px.h == h
    }

  property("seeded scanEffects is a pure function of (input, quality, seed)") =
    Prop.forAll(seedGen, Gen.chooseNum(2, 60), Gen.chooseNum(2, 60), randomPreset,
      seedGen) { (imgSeed, w, h, q, seed) =>
      val in = synthPng(imgSeed, w, h)
      val a = scanEffects(in, q, seed)
      val b = scanEffects(in, q, seed)
      val px = decode(a)
      a.toSeq == b.toSeq && px.w == w && px.h == h
    }

  property("compressImage scales dims by dpi/72 in floor math, any preset") =
    Prop.forAll(seedGen, dimGen, dimGen, minimalPreset) { (seed, w, h, q) =>
      val dpi = q match {
        case "minimum" => 90; case "balanced" => 150; case "high" => 200
        case "premium" => 250; case _ => 300
      }
      val px = decode(compressImage(synthPng(seed, w, h), q))
      px.w == math.max(1, w * dpi / 72) && px.h == math.max(1, h * dpi / 72)
    }

  property("resize hits exact target dims for any source/target shape") =
    Prop.forAll(seedGen, dimGen, dimGen, dimGen, dimGen) { (seed, w, h, tw, th) =>
      val out = resize(decode(synthPng(seed, w, h)), tw, th)
      out.w == tw && out.h == th
    }
}
