// Differential-oracle runner: executes the REAL reference
// (/root/reference/lib, external deps satisfied by the minimal local
// stubs in ./node_modules) over JSON requests on stdin, one per line:
//   {"op": "expand"|"toRDF"|"flatten"|"compact"|"frame"|"fromRDF",
//    "doc": ..., "ctx": ..., "frame": ..., "options": {...}}
// and prints one JSON line per request: {"ok": true, "result": ...}
// or {"ok": false, "code": ..., "message": ...}.
// invoke with NODE_PATH=<this dir>/node_modules so the reference's own
// requires resolve against the local stubs
const jsonld = require('/root/reference/lib/index.js');
const readline = require('readline');

const rl = readline.createInterface({input: process.stdin, terminal: false});
let queue = Promise.resolve();
rl.on('line', line => {
  if (!line.trim()) return;
  queue = queue.then(async () => {
    let req;
    try { req = JSON.parse(line); } catch (e) {
      console.log(JSON.stringify({ok: false, code: 'bad request', message: String(e)}));
      return;
    }
    try {
      const opts = req.options || {};
      const events = [];
      if (req.collectEvents) {
        opts.eventHandler = ({event}) => { events.push({code: event.code, level: event.level}); };
      }
      // optional fixture document table: url -> {document, documentUrl?,
      // contextUrl?} — the reference's local-test-server pattern
      // (tests/test-server.js); exercises remote-doc + remote-context
      // resolution (ContextResolver cycles/limits, link-header context
      // injection) with the real reference code, no HTTP
      if (req.documents) {
        opts.documentLoader = async url => {
          const d = req.documents[url];
          if (!d) {
            const JsonLdError = require('/root/reference/lib/JsonLdError.js');
            throw new JsonLdError(
              `URL "${url}" could not be dereferenced: Not Found`,
              'jsonld.InvalidUrl', {code: 'loading document failed', url});
          }
          return {contextUrl: d.contextUrl || null,
                  documentUrl: d.documentUrl || url,
                  document: d.document};
        };
      }
      let result;
      switch (req.op) {
        case 'expand': result = await jsonld.expand(req.doc, opts); break;
        case 'link': result = await jsonld.link(req.doc, req.ctx || null, opts); break;
        case 'processContext': {
          const active = await jsonld.processContext(null, null, opts);
          const out = await jsonld.processContext(active, req.ctx, opts);
          // serialize the bits our kernel also exposes
          result = {
            mappingKeys: [...out.mappings.keys()].sort(),
            vocab: out['@vocab'] || null,
            language: out['@language'] || null,
          };
          break;
        }
        case 'parseLinkHeader': {
          const util = require('/root/reference/lib/util.js');
          result = util.parseLinkHeader(req.header);
          break;
        }
        case 'toRDF':
          result = await jsonld.toRDF(req.doc, {format: 'application/n-quads', ...opts});
          break;
        case 'flatten': result = await jsonld.flatten(req.doc, req.ctx || null, opts); break;
        case 'compact': result = await jsonld.compact(req.doc, req.ctx, opts); break;
        case 'frame': result = await jsonld.frame(req.doc, req.frame, opts); break;
        case 'fromRDF': result = await jsonld.fromRDF(req.dataset, opts); break;
        case 'merge': result = await jsonld.merge(req.docs, req.ctx || null, opts); break;
        default: throw new Error('unknown op ' + req.op);
      }
      console.log(JSON.stringify(req.collectEvents ?
        {ok: true, result, events} : {ok: true, result}));
    } catch (e) {
      console.log(JSON.stringify({
        ok: false,
        code: (e.details && e.details.code) || e.code || e.name || 'Error',
        message: e.message || String(e)}));
    }
  });
});
rl.on('close', () => { queue.then(() => process.exit(0)); });
