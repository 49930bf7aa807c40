from voicepuppet_tpu.pipeline.synthesize import Synthesizer, SynthesisAssets

__all__ = ["Synthesizer", "SynthesisAssets"]
