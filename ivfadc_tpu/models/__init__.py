"""ivfadc_tpu.models"""
