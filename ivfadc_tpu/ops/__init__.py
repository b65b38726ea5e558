"""ivfadc_tpu.ops"""
