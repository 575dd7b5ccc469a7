from .pipeline import MagicDrivePipeline, PipelineConfig, MagicDriveModules
