from viddet_tpu.models.zoo import get_model, list_models

__all__ = ["get_model", "list_models"]
