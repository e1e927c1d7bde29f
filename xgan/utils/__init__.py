from xgan.utils.dirs import check_create_dir
from xgan.utils.timer import StepTimer

__all__ = ["check_create_dir", "StepTimer"]
