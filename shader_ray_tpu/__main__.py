from shader_ray_tpu.app.main import main

raise SystemExit(main())
