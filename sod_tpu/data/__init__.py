from sod_tpu.data.base import BaseDataset  # noqa: F401
from sod_tpu.data.custom import CustomDataset  # noqa: F401
from sod_tpu.data.dut_omron import DUTOMRONDataset  # noqa: F401
from sod_tpu.data.duts import DUTSDataset  # noqa: F401
from sod_tpu.data.ecssd import ECSSDDataset  # noqa: F401
from sod_tpu.data.factory import get_dataset  # noqa: F401
from sod_tpu.data.loader import DataLoader  # noqa: F401
