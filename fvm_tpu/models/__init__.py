# models are populated as they land; keep import side-effect free
