from sparsebit_tpu.utils.config import CfgNode
from sparsebit_tpu.utils.yaml_utils import _parse_config, update_config
