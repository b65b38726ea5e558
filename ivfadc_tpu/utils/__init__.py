"""ivfadc_tpu.utils"""
