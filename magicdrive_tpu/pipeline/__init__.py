from .pipeline import MagicDrivePipeline, PipelineConfig, MagicDriveModules
from .given_view import GivenViewPipeline
from .video import VideoPipeline
