from serenade_tpu.collaters.ssc import SSCCollater, SSCCollaterNew  # noqa: F401
