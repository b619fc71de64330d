from .cameras import (  # noqa: F401
    PerspectiveCamera, OrthographicCamera, EnvironmentCamera,
    make_perspective, make_orthographic, make_environment,
    generate_rays, camera_we, camera_pdf_we, camera_sample_wi,
)
