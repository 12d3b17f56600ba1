from ns_tpu.utils.host import to_host
