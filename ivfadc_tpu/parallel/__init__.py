"""ivfadc_tpu.parallel"""
