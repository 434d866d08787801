from ember_spark.plans.pipeline import ERPipeline, PipelineConfig  # noqa: F401
from ember_spark.plans.manifest import StageManifest  # noqa: F401
