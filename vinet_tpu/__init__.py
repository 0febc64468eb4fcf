"""vinet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-saliency framework.

Re-designed from scratch with the capabilities of samyak0210/ViNet (the
PyTorch/CUDA reference): S3D-encoder + trilinear-upsampling decoder video
saliency ("ViNet"), the SoundNet audio branch with bilinear or transformer
fusion ("AViNet"), training on DHF1K / Hollywood-2 / UCF / six audio-visual
datasets, sliding-window inference, and the full MIT saliency metric suite
(incl. a C++ FastEMD-equivalent EMD).

TPU-first conventions used throughout:
  * activations are NDHWC: (batch, time, height, width, channels)
  * conv weights are DHWIO: (kT, kH, kW, in, out)
  * modules are functional: `init(key) -> (params, state)` and
    `apply(params, state, x, train) -> (y, new_state)` over pytrees
  * everything hot is jit-compiled with static shapes; batching happens over
    windows, not Python loops
"""

__version__ = "0.1.0"
