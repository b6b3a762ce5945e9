from cleanmarl_tpu.buffers.transition import TransitionBuffer
from cleanmarl_tpu.buffers.episode import EpisodeBuffer, EpisodeAccumulator

__all__ = ["TransitionBuffer", "EpisodeBuffer", "EpisodeAccumulator"]
