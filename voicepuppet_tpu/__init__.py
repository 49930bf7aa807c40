"""voicepuppet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) talking-head synthesis
framework with the capabilities of taylorlu/voicepuppet.

Layer map (mirrors reference SURVEY.md §1, redesigned TPU-first):

  config        YAML + dataclass configuration (ref: config/configure.py)
  audio         log-mel frontend as MXU matmuls (ref: generator/generator.py:60-80)
  face3d        BFM 3DMM math + z-buffer rasterization on device
                (ref: utils/reconstruct_mesh.py, utils/cython/mesh_core.cpp)
  models        flax model zoo: BFMNet, PixReferNet, PixFlowNet, ATNet, VGNet
                (ref: voicepuppet/*)
  data          host-side loaders/generators feeding device batches
                (ref: generator/loader.py, generator/generator.py)
  train         jit train steps, data-parallel over a device mesh, orbax ckpts
                (ref: voicepuppet/*/train_*.py)
  parallel      mesh / sharding helpers (reference has none; see SURVEY §2.3)
  pipeline      end-to-end synthesis: image+audio -> frames -> mp4
                (ref: voicepuppet/pixrefer/infer_bfmvid.py)
  tools         dataset prep toolchain (ref: datasets/)
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the full-width BFMNet backbone
    takes minutes to compile through the TPU tunnel; cache hits make every
    process after the first start instantly."""
    import os
    try:
        import jax
        cache_dir = os.environ.get(
            "VOICEPUPPET_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

