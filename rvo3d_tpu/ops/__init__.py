from rvo3d_tpu.ops.pallas_gru import masked_gru_scan, pallas_available

__all__ = ["masked_gru_scan", "pallas_available"]
