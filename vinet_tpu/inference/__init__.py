from vinet_tpu.inference.engine import SlidingWindowPredictor, window_plan

__all__ = ["SlidingWindowPredictor", "window_plan"]
