from eamm_tpu.infer.pipeline import EammPipeline, PipelineOptions
from eamm_tpu.infer.export import (export_render_artifact,
                                    RenderArtifact, ArtifactPipeline)
