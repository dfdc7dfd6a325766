from eamm_tpu.infer.pipeline import EammPipeline, PipelineOptions
