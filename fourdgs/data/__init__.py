from fourdgs.data.base import BaseDataset, load_dataset  # noqa: F401
from fourdgs.data.synthetic import SyntheticDataset  # noqa: F401
