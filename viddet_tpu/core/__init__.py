from viddet_tpu.core.precision import Policy, DEFAULT_POLICY

__all__ = ["Policy", "DEFAULT_POLICY"]
