from sin_inn_tpu.ops import (coupling, haar, losses, permute, squeeze, subnet,
                             tcr, warp)
