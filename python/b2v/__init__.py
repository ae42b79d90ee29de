"""b2v: Blender -> vision_tpu scene exporter add-on.

Counterpart of the reference's `python/b2v` package. The bpy-dependent
shims live here (guarded import so the package loads headless); the JSON
generation is in exporter.py and unit-tested without Blender.

Install: copy python/b2v into Blender's addons dir, enable "b2v", then
File > Export > vision_tpu scene (.json).
"""
bl_info = {
    "name": "b2v (vision_tpu exporter)",
    "author": "vision_tpu",
    "version": (0, 1, 0),
    "blender": (3, 0, 0),
    "location": "File > Export",
    "description": "Export the scene to a vision_tpu JSON + OBJ assets",
    "category": "Import-Export",
}

try:
    import bpy
    _HAS_BPY = True
except ImportError:  # headless / test environment
    _HAS_BPY = False

from . import exporter  # noqa: F401


if _HAS_BPY:
    import numpy as _np

    class _MeshShim:
        def __init__(self, ob, deps):
            ev = ob.evaluated_get(deps)
            me = ev.to_mesh()
            me.calc_loop_triangles()
            self.name = ob.name.replace(" ", "_")
            self.vertices = [tuple(v.co) for v in me.vertices]
            self.faces = [tuple(t.vertices) for t in me.loop_triangles]
            self.uvs = None
            self.matrix_world = [list(r) for r in ob.matrix_world]
            self.material_name = (ob.active_material.name
                                  if ob.active_material else None)

    class _MatShim:
        def __init__(self, mat):
            self.name = mat.name
            self.principled = {}
            if mat.use_nodes:
                for n in mat.node_tree.nodes:
                    if n.bl_idname == "ShaderNodeBsdfPrincipled":
                        i = n.inputs
                        self.principled = {
                            "base_color": tuple(i["Base Color"].default_value),
                            "metallic": i["Metallic"].default_value,
                            "roughness": i["Roughness"].default_value,
                            "ior": i["IOR"].default_value,
                        }
                        break

    class _LightShim:
        def __init__(self, ob):
            self.name = ob.name
            self.light_type = ob.data.type
            self.color = tuple(ob.data.color)
            self.energy = ob.data.energy
            self.matrix_world = [list(r) for r in ob.matrix_world]
            self.spot_size = getattr(ob.data, "spot_size", 0.785)
            self.spot_blend = getattr(ob.data, "spot_blend", 0.15)
            self.size = getattr(ob.data, "size", 1.0)

    class _CamShim:
        def __init__(self, ob):
            self.matrix_world = [list(r) for r in ob.matrix_world]
            self.angle_y = ob.data.angle_y
            self.lens = ob.data.lens
            self.dof_enabled = ob.data.dof.use_dof
            self.fstop = ob.data.dof.aperture_fstop
            self.focus_distance = ob.data.dof.focus_distance

    class _SceneShim:
        def __init__(self, context):
            deps = context.evaluated_depsgraph_get()
            sc = context.scene
            self.meshes = [_MeshShim(o, deps) for o in sc.objects
                           if o.type == "MESH" and o.visible_get()]
            self.materials = [_MatShim(m) for m in bpy.data.materials]
            self.lights = [_LightShim(o) for o in sc.objects
                           if o.type == "LIGHT"]
            self.camera = _CamShim(sc.camera) if sc.camera else None
            self.render_res = (sc.render.resolution_x,
                               sc.render.resolution_y)
            self.world_hdri = None
            self.world_strength = 1.0

    class ExportVision(bpy.types.Operator):
        bl_idname = "export_scene.vision_tpu"
        bl_label = "Export vision_tpu scene"
        filepath: bpy.props.StringProperty(subtype="FILE_PATH")

        def execute(self, context):
            exporter.export_scene(_SceneShim(context), self.filepath)
            return {"FINISHED"}

        def invoke(self, context, event):
            context.window_manager.fileselect_add(self)
            return {"RUNNING_MODAL"}

    def _menu(self, context):
        self.layout.operator(ExportVision.bl_idname,
                             text="vision_tpu scene (.json)")

    def register():
        bpy.utils.register_class(ExportVision)
        bpy.types.TOPBAR_MT_file_export.append(_menu)

    def unregister():
        bpy.utils.unregister_class(ExportVision)
        bpy.types.TOPBAR_MT_file_export.remove(_menu)
