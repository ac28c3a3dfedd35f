from sin_inn_tpu.core.config import SRConfig, FlowConfig, PrepareConfig
