/* Caching numpy data allocator (PyDataMem_SetHandler).
 *
 * Why: on the virtualized single-core hosts this framework targets, page
 * population of FRESH heap growth is pathologically slow in phases
 * (measured 150 MB/s vs 7-14 GB/s steady-state; a 1.3 GB np.zeros cost
 * 35 s while the kernel consuming it ran in 1.7 s). glibc reuses freed
 * chunks, but the setup phase's mix of 0.1-5 GB temporaries fragments
 * the heap and keeps extending brk, re-paying population on every
 * stage. This handler keeps freed blocks >= 1 MB in per-size-class
 * free lists and reuses their already-populated pages, so the process
 * only ever pays population once per high-water byte. Paired with
 * mlockall in parelag_tpu.__init__ (pages stay resident), allocation
 * cost collapses to a memset.
 *
 * Replaces the role of the reference's MemoryUtils layer
 * (src/utilities/MemoryUtils.hpp) at the allocator level.
 *
 * Every block carries a 64-byte header (magic, class, requested size);
 * numpy calls the SAME handler that allocated an array for its free, so
 * headered and foreign blocks never mix.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define HDR 64
#define MAGIC 0x50454c41475055ULL
#define BIG ((size_t)1 << 20)      /* cache blocks >= 1 MB total */
#define NCLS 96                    /* {2^k, 3*2^(k-1)} from 1 MB up */
#define SLOTS 16                   /* cached blocks per class */

typedef struct {
    uint64_t magic;
    int64_t cls;                   /* -1: small (raw malloc'd) */
    uint64_t cbytes;               /* block's true allocation size */
    uint64_t req;                  /* caller-requested payload bytes */
    uint64_t pad[4];
} hdr_t;

static void *g_slots[NCLS][SLOTS];
static int g_nslots[NCLS];
static size_t g_cached = 0;
static size_t g_cap = (size_t)48 << 30;
static uint64_t g_hits = 0, g_misses = 0;
static pthread_mutex_t g_lock = PTHREAD_MUTEX_INITIALIZER;

/* smallest {2^k, 3*2^(k-1)} >= total, starting at 1 MB */
static int size_class(size_t total, size_t *bytes) {
    size_t lo = BIG;
    int c = 0;
    for (;;) {
        if (total <= lo) { *bytes = lo; return c; }
        size_t mid = lo + (lo >> 1);
        if (total <= mid) { *bytes = mid; return c + 1; }
        lo <<= 1;
        c += 2;
        if (c >= NCLS - 2) { *bytes = total; return NCLS - 1; }
    }
}

static void *pa_malloc(void *ctx, size_t size) {
    (void)ctx;
    size_t total = size + HDR;
    hdr_t *h;
    if (total < BIG) {
        h = (hdr_t *)malloc(total);
        if (!h) return NULL;
        h->magic = MAGIC; h->cls = -1; h->cbytes = total; h->req = size;
        return (char *)h + HDR;
    }
    size_t cbytes;
    int cls = size_class(total, &cbytes);
    h = NULL;
    pthread_mutex_lock(&g_lock);
    /* best-fit within 2 classes (<= 2x memory): a populated slightly-
     * bigger block beats paying first-touch population for an exact one */
    for (int c = cls; c < NCLS - 1 && c <= cls + 2; ++c) {
        if (g_nslots[c] > 0) {
            h = (hdr_t *)g_slots[c][--g_nslots[c]];
            g_cached -= h->cbytes;
            g_hits++;
            break;
        }
    }
    if (!h) g_misses++;
    pthread_mutex_unlock(&g_lock);
    if (!h) {
        h = (hdr_t *)malloc(cbytes);
        if (!h) return NULL;
        h->cls = cls; h->cbytes = cbytes;
    }
    h->magic = MAGIC; h->req = size;
    return (char *)h + HDR;
}

static void *pa_calloc(void *ctx, size_t nelem, size_t elsize) {
    if (elsize && nelem > (SIZE_MAX - HDR) / elsize) return NULL;
    size_t size = nelem * elsize;
    void *p = pa_malloc(ctx, size);
    /* cached pages are already populated: this memset runs at
     * steady-state bandwidth, not first-touch speed */
    if (p) memset(p, 0, size);
    return p;
}

static void pa_free(void *ctx, void *ptr, size_t size) {
    (void)ctx; (void)size;
    if (!ptr) return;
    hdr_t *h = (hdr_t *)((char *)ptr - HDR);
    if (h->magic != MAGIC) { /* never ours: defensive leak-over-crash */
        return;
    }
    if (h->cls < 0) { free(h); return; }
    int cls = (int)h->cls;         /* the block's own class identity */
    size_t cbytes = h->cbytes;
    int cached = 0;
    pthread_mutex_lock(&g_lock);
    if (cls < NCLS - 1 && g_nslots[cls] < SLOTS
            && g_cached + cbytes <= g_cap) {
        g_slots[cls][g_nslots[cls]++] = h;
        g_cached += cbytes;
        cached = 1;
    }
    pthread_mutex_unlock(&g_lock);
    if (!cached) free(h);
}

static void *pa_realloc(void *ctx, void *ptr, size_t new_size) {
    if (!ptr) return pa_malloc(ctx, new_size);
    hdr_t *h = (hdr_t *)((char *)ptr - HDR);
    if (h->magic != MAGIC) return NULL;
    if (h->cls < 0 && new_size + HDR < BIG) {
        hdr_t *h2 = (hdr_t *)realloc(h, new_size + HDR);
        if (!h2) return NULL;
        h2->req = new_size;
        return (char *)h2 + HDR;
    }
    size_t old = h->req;
    void *q = pa_malloc(ctx, new_size);
    if (!q) return NULL;
    memcpy(q, ptr, old < new_size ? old : new_size);
    pa_free(ctx, ptr, old);
    return q;
}

static PyDataMem_Handler g_handler = {
    "parelag_cached_allocator",
    1,
    {NULL, pa_malloc, pa_calloc, pa_realloc, pa_free},
};

static PyObject *g_old = NULL;

static PyObject *install(PyObject *self, PyObject *args) {
    unsigned long long cap_bytes = 0;
    if (!PyArg_ParseTuple(args, "|K", &cap_bytes)) return NULL;
    if (cap_bytes) g_cap = (size_t)cap_bytes;
    PyObject *cap = PyCapsule_New(&g_handler, "mem_handler", NULL);
    if (!cap) return NULL;
    PyObject *old = PyDataMem_SetHandler(cap);
    Py_DECREF(cap);
    if (!old) return NULL;
    Py_XDECREF(g_old);
    g_old = old;                   /* keep the default handler alive */
    Py_RETURN_NONE;
}

static PyObject *uninstall(PyObject *self, PyObject *args) {
    if (g_old) {
        PyObject *prev = PyDataMem_SetHandler(g_old);
        Py_XDECREF(prev);
        Py_CLEAR(g_old);
    }
    Py_RETURN_NONE;
}

static PyObject *stats(PyObject *self, PyObject *args) {
    pthread_mutex_lock(&g_lock);
    PyObject *d = Py_BuildValue(
        "{s:K,s:K,s:K,s:K}", "hits", (unsigned long long)g_hits,
        "misses", (unsigned long long)g_misses,
        "cached_bytes", (unsigned long long)g_cached,
        "cap_bytes", (unsigned long long)g_cap);
    pthread_mutex_unlock(&g_lock);
    return d;
}

static PyObject *trim(PyObject *self, PyObject *args) {
    /* release every cached block back to libc (tests / low-memory) */
    pthread_mutex_lock(&g_lock);
    for (int c = 0; c < NCLS; ++c) {
        while (g_nslots[c] > 0) free(g_slots[c][--g_nslots[c]]);
    }
    g_cached = 0;
    pthread_mutex_unlock(&g_lock);
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"install", install, METH_VARARGS,
     "install(cap_bytes=0): set the caching numpy data allocator"},
    {"uninstall", uninstall, METH_NOARGS,
     "restore the previous numpy data allocator"},
    {"stats", stats, METH_NOARGS, "cache hit/miss/size counters"},
    {"trim", trim, METH_NOARGS, "free all cached blocks"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "parelag_npalloc",
    "Caching numpy data allocator for parelag_tpu", -1, methods};

/* fork safety: a child forked while another thread held the cache lock
 * would deadlock on its first big allocation. Serialize around fork and
 * hand the child a clean, unlocked cache. */
static void fork_prepare(void) { pthread_mutex_lock(&g_lock); }
static void fork_parent(void) { pthread_mutex_unlock(&g_lock); }
static void fork_child(void) {
    pthread_mutex_t fresh = PTHREAD_MUTEX_INITIALIZER;
    memcpy(&g_lock, &fresh, sizeof(fresh));
}

PyMODINIT_FUNC PyInit_parelag_npalloc(void) {
    import_array();
    pthread_atfork(fork_prepare, fork_parent, fork_child);
    return PyModule_Create(&moduledef);
}
