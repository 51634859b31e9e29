/* nibblecodec — host-side INT4 span packing/unpacking.
 *
 * The C counterpart of dgq_tpu/quant/packing.py's nibble codec, for
 * host-side checkpoint conversion at 10-100B-parameter scale where the
 * numpy path allocates several full-size int32 temporaries.  Operates on
 * contiguous uint8/int8 buffers in the TPU-native span layout:
 *
 *   span layout (span = 2*groupsize logical K rows): within each span,
 *   byte row r packs logical row r (high nibble) and row r + span/2
 *   (low nibble).  span == 0 selects the adjacent-pair layout
 *   (byte k2 = rows 2*k2 / 2*k2+1), the reference-compatible scheme
 *   (reference: dgq/quant/quant_linear.py:8-22).
 *
 * Exposed via a tiny CPython module (no pybind11 — CPython C API only,
 * per the build environment).  Buffers arrive as objects supporting the
 * buffer protocol (numpy arrays); shapes are passed explicitly.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static int get_buf(PyObject *obj, Py_buffer *view, int writable) {
    int flags = PyBUF_C_CONTIGUOUS | (writable ? PyBUF_WRITABLE : PyBUF_SIMPLE);
    if (PyObject_GetBuffer(obj, view, flags) != 0) return -1;
    return 0;
}

/* pack(codes (K, N) uint8 in [0,15], out (K/2, N) int8, K, N, span) */
static PyObject *pack_nibbles(PyObject *self, PyObject *args) {
    PyObject *codes_obj, *out_obj;
    Py_ssize_t K, N, span;
    if (!PyArg_ParseTuple(args, "OOnnn", &codes_obj, &out_obj, &K, &N, &span))
        return NULL;
    Py_buffer codes, out;
    if (get_buf(codes_obj, &codes, 0)) return NULL;
    if (get_buf(out_obj, &out, 1)) { PyBuffer_Release(&codes); return NULL; }
    if (codes.len < K * N || out.len < (K / 2) * N || (K % 2) ||
        (span && (K % span || span % 2))) {
        PyBuffer_Release(&codes); PyBuffer_Release(&out);
        PyErr_SetString(PyExc_ValueError, "bad shapes for pack_nibbles");
        return NULL;
    }
    const uint8_t *c = (const uint8_t *)codes.buf;
    uint8_t *o = (uint8_t *)out.buf;

    Py_BEGIN_ALLOW_THREADS
    if (span) {
        Py_ssize_t half = span / 2;
        Py_ssize_t nspans = K / span;
        for (Py_ssize_t s = 0; s < nspans; s++) {
            const uint8_t *hi = c + (s * span) * N;
            const uint8_t *lo = c + (s * span + half) * N;
            uint8_t *dst = o + (s * half) * N;
            for (Py_ssize_t i = 0; i < half * N; i++)
                dst[i] = (uint8_t)((hi[i] << 4) | (lo[i] & 0xF));
        }
    } else {
        for (Py_ssize_t k2 = 0; k2 < K / 2; k2++) {
            const uint8_t *hi = c + (2 * k2) * N;
            const uint8_t *lo = c + (2 * k2 + 1) * N;
            uint8_t *dst = o + k2 * N;
            for (Py_ssize_t j = 0; j < N; j++)
                dst[j] = (uint8_t)((hi[j] << 4) | (lo[j] & 0xF));
        }
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&codes); PyBuffer_Release(&out);
    Py_RETURN_NONE;
}

/* unpack(packed (K/2, N) int8, out (K, N) uint8, K, N, span) */
static PyObject *unpack_nibbles(PyObject *self, PyObject *args) {
    PyObject *packed_obj, *out_obj;
    Py_ssize_t K, N, span;
    if (!PyArg_ParseTuple(args, "OOnnn", &packed_obj, &out_obj, &K, &N, &span))
        return NULL;
    Py_buffer packed, out;
    if (get_buf(packed_obj, &packed, 0)) return NULL;
    if (get_buf(out_obj, &out, 1)) { PyBuffer_Release(&packed); return NULL; }
    if (packed.len < (K / 2) * N || out.len < K * N || (K % 2) ||
        (span && (K % span || span % 2))) {
        PyBuffer_Release(&packed); PyBuffer_Release(&out);
        PyErr_SetString(PyExc_ValueError, "bad shapes for unpack_nibbles");
        return NULL;
    }
    const uint8_t *p = (const uint8_t *)packed.buf;
    uint8_t *o = (uint8_t *)out.buf;

    Py_BEGIN_ALLOW_THREADS
    if (span) {
        Py_ssize_t half = span / 2;
        Py_ssize_t nspans = K / span;
        for (Py_ssize_t s = 0; s < nspans; s++) {
            const uint8_t *src = p + (s * half) * N;
            uint8_t *hi = o + (s * span) * N;
            uint8_t *lo = o + (s * span + half) * N;
            for (Py_ssize_t i = 0; i < half * N; i++) {
                hi[i] = (uint8_t)(src[i] >> 4);
                lo[i] = (uint8_t)(src[i] & 0xF);
            }
        }
    } else {
        for (Py_ssize_t k2 = 0; k2 < K / 2; k2++) {
            const uint8_t *src = p + k2 * N;
            uint8_t *hi = o + (2 * k2) * N;
            uint8_t *lo = o + (2 * k2 + 1) * N;
            for (Py_ssize_t j = 0; j < N; j++) {
                hi[j] = (uint8_t)(src[j] >> 4);
                lo[j] = (uint8_t)(src[j] & 0xF);
            }
        }
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&packed); PyBuffer_Release(&out);
    Py_RETURN_NONE;
}

/* quantize_pack(w (K, N) float32, scales (G, N) float32 effective,
 *               zeros (G, N) float32, out (K/2, N) int8,
 *               K, N, groupsize, span)
 * Fused round(w/scale + zero) -> clip [0,15] -> nibble pack, no
 * full-size integer temporaries. */
static PyObject *quantize_pack(PyObject *self, PyObject *args) {
    PyObject *w_obj, *s_obj, *z_obj, *out_obj;
    Py_ssize_t K, N, g, span;
    if (!PyArg_ParseTuple(args, "OOOOnnnn", &w_obj, &s_obj, &z_obj, &out_obj,
                          &K, &N, &g, &span))
        return NULL;
    Py_buffer w, s, z, out;
    if (get_buf(w_obj, &w, 0)) return NULL;
    if (get_buf(s_obj, &s, 0)) { PyBuffer_Release(&w); return NULL; }
    if (get_buf(z_obj, &z, 0)) { PyBuffer_Release(&w); PyBuffer_Release(&s); return NULL; }
    if (get_buf(out_obj, &out, 1)) {
        PyBuffer_Release(&w); PyBuffer_Release(&s); PyBuffer_Release(&z);
        return NULL;
    }
    Py_ssize_t G = K / g;
    if (w.len < K * N * (Py_ssize_t)sizeof(float) ||
        s.len < G * N * (Py_ssize_t)sizeof(float) ||
        z.len < G * N * (Py_ssize_t)sizeof(float) ||
        out.len < (K / 2) * N || (span && (K % span)) || (K % g)) {
        PyBuffer_Release(&w); PyBuffer_Release(&s);
        PyBuffer_Release(&z); PyBuffer_Release(&out);
        PyErr_SetString(PyExc_ValueError, "bad shapes for quantize_pack");
        return NULL;
    }
    const float *wf = (const float *)w.buf;
    const float *sf = (const float *)s.buf;
    const float *zf = (const float *)z.buf;
    uint8_t *o = (uint8_t *)out.buf;

    Py_BEGIN_ALLOW_THREADS
    Py_ssize_t half = span ? span / 2 : 1;
    for (Py_ssize_t k2 = 0; k2 < K / 2; k2++) {
        Py_ssize_t khi, klo;
        if (span) {
            Py_ssize_t sp = k2 / half, r = k2 % half;
            khi = sp * span + r;
            klo = khi + half;
        } else {
            khi = 2 * k2;
            klo = 2 * k2 + 1;
        }
        const float *whi = wf + khi * N, *wlo = wf + klo * N;
        const float *shi = sf + (khi / g) * N, *slo = sf + (klo / g) * N;
        const float *zhi = zf + (khi / g) * N, *zlo = zf + (klo / g) * N;
        uint8_t *dst = o + k2 * N;
        for (Py_ssize_t j = 0; j < N; j++) {
            float qh = whi[j] / shi[j] + zhi[j];
            float ql = wlo[j] / slo[j] + zlo[j];
            long ih = lroundf(qh), il = lroundf(ql);
            if (ih < 0) ih = 0; if (ih > 15) ih = 15;
            if (il < 0) il = 0; if (il > 15) il = 15;
            dst[j] = (uint8_t)((ih << 4) | il);
        }
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&w); PyBuffer_Release(&s);
    PyBuffer_Release(&z); PyBuffer_Release(&out);
    Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"pack_nibbles", pack_nibbles, METH_VARARGS,
     "pack_nibbles(codes_u8, out_i8, K, N, span)"},
    {"unpack_nibbles", unpack_nibbles, METH_VARARGS,
     "unpack_nibbles(packed_i8, out_u8, K, N, span)"},
    {"quantize_pack", quantize_pack, METH_VARARGS,
     "quantize_pack(w_f32, scales_f32, zeros_f32, out_i8, K, N, groupsize, span)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "nibblecodec",
    "Host-side INT4 span nibble codec for dgq_tpu checkpoints.", -1, Methods,
};

PyMODINIT_FUNC PyInit_nibblecodec(void) { return PyModule_Create(&moduledef); }
